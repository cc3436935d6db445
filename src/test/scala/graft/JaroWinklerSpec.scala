package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinkler
import graft.ops.Functions

class JaroWinklerSpec extends AnyFunSuite with SparkFixture {

  test("textbook values (Winkler's canonical examples)") {
    assert(math.abs(JaroWinkler.computeStr("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.computeStr("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(JaroWinkler.computeStr("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
  }

  test("non-BMP inputs match DuckDB's byte-based semantics (pinned values)") {
    // values measured from DuckDB 1.0 jaro_winkler_similarity — byte
    // interpretation, NOT code points (code-point JW would give 0.6111…,
    // 0.85, 0.925 respectively)
    assert(math.abs(JaroWinkler.computeStr("a💩b", "ab") - 0.5555555555555555) < 1e-12)
    assert(math.abs(JaroWinkler.computeStr("💩💩", "💩") - 0.9) < 1e-12)
    assert(math.abs(JaroWinkler.computeStr("x😀yz", "xyz") - 0.4920634920634921) < 1e-12)
  }

  test("fuzzyMatchQuery: exact probe scores 1.0; every probe matches something close") {
    val rows = graft.ops.Functions.fuzzyMatchQuery(spark, sfDir).collect()
    assert(rows.length === 8)
    val exact = rows.find(_.getString(0) == "small ring").get
    assert(exact.getString(2) === "small ring" && exact.getDouble(3) === 1.0)
    // typo probes still land close to their intended names
    assert(rows.forall(_.getDouble(3) >= 0.8))
  }

  test("edge cases: empty, identical, disjoint, below boost threshold") {
    assert(JaroWinkler.computeStr("", "") === 1.0)
    assert(JaroWinkler.computeStr("", "abc") === 0.0)
    assert(JaroWinkler.computeStr("abc", "abc") === 1.0)
    assert(JaroWinkler.computeStr("abc", "xyz") === 0.0)
    // jaro exactly at 0.7 must NOT get the prefix boost (strict >)
    val j = JaroWinkler.computeStr("abcdef", "abdcfe")
    assert(j > 0 && j < 1)
  }

  test("codegen'd column path equals the static reference on the corpus vocab pairs") {
    val rows = graft.ops.Scale.allPairsBlocked(
        graft.io.Sources.documents(spark, sfDir)
          .select(explode(split(col("text"), " ")).as("tok")).distinct(),
        "tok", blocks = 4)
      .select(col("tok_a"), col("tok_b"),
              Functions.jaroWinkler(col("tok_a"), col("tok_b")).as("jw"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      assert(r.getDouble(2) === JaroWinkler.computeStr(r.getString(0), r.getString(1)))
    }
  }

  test("SQL registration: jaro_winkler callable after GraftExtensions.register") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").collect()(0).getDouble(0)
    assert(math.abs(v - 0.9611111111111111) < 1e-12)
  }

  test("null inputs yield null") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS jw").collect()(0)
    assert(r.isNullAt(0))
  }
}
