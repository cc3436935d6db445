package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract drift guards: every declared query must have an oracle twin
  * (the t2 gate hashes exactly the intersection — a missing side silently
  * weakens the check).
  */
class ContractSpec extends AnyFunSuite with SparkFixture {

  test("queries and oracleSql declare identical key sets") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("every key follows the q_ naming convention") {
    assert(SparkEntry.queries.keySet.forall(_.startsWith("q_")))
  }

  test("entry() returns rows (t1 smoke twin)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("declared outputs carry only comparator-safe column types") {
    // the round-1 gate failure mode: the driver's comparator coerces
    // DuckDB decimals to float64 (trailing-zero hash splits), cannot sort
    // array cells, and float32 repr drifts — so no declared output may
    // carry them. Schema analysis only; no query execution.
    val banned = Seq("decimal", "array", "float", "binary")
    SparkEntry.queries.foreach { case (k, fn) =>
      fn(spark, sfDir).schema.fields.foreach { f =>
        val t = f.dataType.typeName
        assert(!banned.exists(t.startsWith),
          s"$k.${f.name}: $t is comparator-unsafe (see SURVEY §2.2)")
      }
    }
  }

  test("oracle SQL contains no stray placeholders or unmatched quotes") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("{dir}") && !sql.contains("???"), s"$k has placeholders")
      assert(sql.count(_ == '\'') % 2 === 0, s"$k has unbalanced quotes")
    }
  }
}
