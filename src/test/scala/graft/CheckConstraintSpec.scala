package graft

import org.scalatest.funsuite.AnyFunSuite

/** Write-time CHECK constraints (`check.<name>` table properties): a
  * violating row fails the write BEFORE commit and the table is
  * untouched; SQL NULL-passes semantics; ALTER-time validation of bad
  * expressions; MoR update images gated like plain inserts.
  */
class CheckConstraintSpec extends AnyFunSuite with SparkFixture {

  private val T = "graft_ck.default.ck_t"

  private def setup(props: String = ""): Unit = {
    spark.conf.set("spark.sql.catalog.graft_ck", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, m BIGINT) $props")
  }

  test("violating insert aborts; table unchanged; passing insert lands") {
    setup("TBLPROPERTIES ('check.positive' = 'm > 0')")
    spark.sql(s"INSERT INTO $T VALUES ('ok', 5)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $T VALUES ('good', 1), ('bad', -3)")
    }
    assert(e.getMessage.contains("positive") ||
           e.getCause != null && e.getCause.getMessage.contains("positive") ||
           e.toString.contains("CHECK"), s"unhelpful error: $e")
    // the whole statement rolled back — including its passing row
    val rows = spark.sql(s"SELECT k, m FROM $T ORDER BY k").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ok"))
  }

  test("NULL passes (SQL unknown rule); type coercion works; multiple checks compose") {
    setup("TBLPROPERTIES ('check.positive' = 'm > 0', 'check.key_len' = 'length(k) <= 3')")
    // NULL m: m > 0 is UNKNOWN -> passes, the SQL-standard rule
    spark.sql(s"INSERT INTO $T VALUES ('a', NULL), ('b', 7)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $T").collect()(0).getLong(0) === 2)
    // second constraint still enforced
    intercept[Exception](spark.sql(s"INSERT INTO $T VALUES ('toolong', 1)"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $T").collect()(0).getLong(0) === 2)
  }

  test("ALTER SET of a bad expression fails the ALTER, not the next write") {
    setup()
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('check.broken' = 'no_such_col > 0')")
    }
    assert(bad.getMessage.contains("broken") || bad.toString.contains("no_such_col"))
    val notBool = intercept[Exception] {
      spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('check.notbool' = 'm + 1')")
    }
    assert(notBool.getMessage.contains("BOOLEAN") || notBool.toString.contains("notbool"))
    // a nondeterministic check is rejected up front (it would pass or fail
    // the same row by luck; round-9 ADVICE fix)
    val nondet = intercept[Exception] {
      spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('check.lucky' = 'rand() < 0.5')")
    }
    assert(nondet.toString.contains("nondeterministic"), nondet.toString)
    // a good one installs and enforces from the next write on
    spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('check.cap' = 'm < 100')")
    spark.sql(s"INSERT INTO $T VALUES ('x', 50)")
    intercept[Exception](spark.sql(s"INSERT INTO $T VALUES ('y', 500)"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $T").collect()(0).getLong(0) === 1)
    // UNSET lifts the gate
    spark.sql(s"ALTER TABLE $T UNSET TBLPROPERTIES ('check.cap')")
    spark.sql(s"INSERT INTO $T VALUES ('y', 500)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $T").collect()(0).getLong(0) === 2)
  }

  test("MoR UPDATE images are gated: an update into violation fails, state intact") {
    setup("TBLPROPERTIES ('check.positive' = 'm > 0')")
    spark.sql(s"INSERT INTO $T VALUES ('a', 5), ('b', 6)")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $T SET m = -1 WHERE k = 'a'")
    }
    assert(e.toString.nonEmpty)
    val rows = spark.sql(s"SELECT k, m FROM $T ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("a", 5L), ("b", 6L)), "failed UPDATE must leave the table intact")
    // a legal update passes
    spark.sql(s"UPDATE $T SET m = 50 WHERE k = 'a'")
    assert(spark.sql(s"SELECT m FROM $T WHERE k = 'a'").collect()(0).getLong(0) === 50)
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("validate_pk: clean and duplicate key sets, composite keys, bare names") {
    spark.conf.set("spark.sql.catalog.graft_ck", "graft.catalog.GraftCatalog")
    val T2 = "graft_ck.default.pk_t"
    spark.sql(s"DROP TABLE IF EXISTS $T2")
    spark.sql(s"CREATE TABLE $T2 (a BIGINT, b STRING, m BIGINT)")
    spark.sql(s"INSERT INTO $T2 VALUES (1,'x',10), (2,'x',20), (1,'y',30), (1,'x',40), (1,'x',50)")
    // single-column key: a=1 appears 4 times
    val r1 = spark.sql(s"CALL graft_ck.system.validate_pk('default.pk_t', 'a')").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) === ((5L, 2L, 1L, 4L)))
    // composite key: (1,x) x3 — bare table name form
    val r2 = spark.sql(s"CALL graft_ck.system.validate_pk('pk_t', 'a, b')").collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) === ((5L, 3L, 1L, 3L)))
    // a genuinely unique key reports zero duplicates
    val r3 = spark.sql(s"CALL graft_ck.system.validate_pk('pk_t', 'a, b, m')").collect()(0)
    assert(r3.getLong(2) === 0L && r3.getLong(3) === 1L)
    spark.sql(s"DROP TABLE IF EXISTS $T2")
  }
}
