package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Det.{asOut, money}
import graft.io.Sources
import graft.ops.Merge

/** Executable MERGE INTO (and UPDATE/DELETE) SQL against the in-memory
  * DSv2 catalog (graft.catalog.GraftCatalog), twinned against the
  * dataflow verbs in ops.Merge — the two routes to postpy's
  * `upsert_records` must produce identical post-states.
  */
class MergeSqlSpec extends AnyFunSuite with SparkFixture {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalog")

  private val ddl =
    """(c_custkey BIGINT, c_name STRING, c_nationkey BIGINT,
      | c_acctbal DECIMAL(18,2), c_mktsegment STRING)""".stripMargin

  /** Load the sf fixture customer table into a fresh catalog table. */
  private def freshCustomer(tbl: String): Unit = {
    ensureCatalog()
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.default.$tbl")
    spark.sql(s"CREATE TABLE graft_cat.default.$tbl $ddl")
    Sources.customer(spark, sfDir)
      .withColumn("c_acctbal", money(col("c_acctbal")))
      .createOrReplaceTempView(s"${tbl}_src")
    spark.sql(s"INSERT INTO graft_cat.default.$tbl SELECT * FROM ${tbl}_src")
  }

  /** Per-segment checksum of a customer-shaped frame. */
  private def checksum(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), asOut(sum(col("c_acctbal"))).as("sum_bal"))

  test("MERGE INTO equals Merge.upsert dataflow on the customer/stage fixture") {
    freshCustomer("customer_m")
    // the same stage as Merge.upsertMerge: every 10th customer updated
    // (acctbal+100), a synthetic new customer for every 100th
    val t = Sources.customer(spark, sfDir).withColumn("c_acctbal", money(col("c_acctbal")))
    val updates = t.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", money(col("c_acctbal") + 100))
    val inserts = t.filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"), lit("Customer#new").as("c_name"),
              col("c_nationkey"), money(lit(500)).as("c_acctbal"),
              lit("AUTOMOBILE").as("c_mktsegment"))
    val stage = updates.unionByName(inserts)
    stage.createOrReplaceTempView("merge_stage")

    spark.sql(
      """MERGE INTO graft_cat.default.customer_m t
        |USING merge_stage s
        |ON t.c_custkey = s.c_custkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val viaSql = checksum(spark.table("graft_cat.default.customer_m"))
    val viaDataflow = checksum(Merge.upsert(t, stage, Seq("c_custkey")))
    assert(viaSql.exceptAll(viaDataflow).isEmpty && viaDataflow.exceptAll(viaSql).isEmpty)
    // row-identity check, not just aggregates
    val merged = Merge.upsert(t, stage, Seq("c_custkey"))
    val tblRows = spark.table("graft_cat.default.customer_m")
    assert(tblRows.count() === merged.count())
    assert(tblRows.exceptAll(merged).isEmpty && merged.exceptAll(tblRows).isEmpty)
  }

  test("MERGE matched stage row wins WHOLESALE including NULLs (DO-UPDATE semantics)") {
    freshCustomer("customer_n")
    // a stage row that sets c_name to NULL must null it in the table —
    // the coalesce-per-column trap the dataflow upsert also avoids
    spark.sql(
      """MERGE INTO graft_cat.default.customer_n t
        |USING (SELECT 1L AS c_custkey, CAST(NULL AS STRING) AS c_name,
        |              7L AS c_nationkey, CAST(42.00 AS DECIMAL(18,2)) AS c_acctbal,
        |              'MACHINERY' AS c_mktsegment) s
        |ON t.c_custkey = s.c_custkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = spark.table("graft_cat.default.customer_n")
      .filter(col("c_custkey") === 1).collect()
    assert(r.length === 1)
    assert(r.head.isNullAt(r.head.fieldIndex("c_name")), "stage NULL must overwrite")
    assert(r.head.getAs[java.math.BigDecimal]("c_acctbal").doubleValue() === 42.0)
  }

  test("DELETE FROM equals Merge.deleteByKeys dataflow") {
    freshCustomer("customer_d")
    spark.sql("DELETE FROM graft_cat.default.customer_d WHERE c_custkey % 7 = 0")
    val t = Sources.customer(spark, sfDir).withColumn("c_acctbal", money(col("c_acctbal")))
    val keys = t.filter(col("c_custkey") % 7 === 0).select(col("c_custkey"))
    val expected = Merge.deleteByKeys(t, keys, Seq("c_custkey"))
    val got = spark.table("graft_cat.default.customer_d")
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("UPDATE SET equals the conditional-projection dataflow") {
    freshCustomer("customer_u")
    spark.sql(
      """UPDATE graft_cat.default.customer_u
        |SET c_acctbal = c_acctbal + 50 WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    val t = Sources.customer(spark, sfDir).withColumn("c_acctbal", money(col("c_acctbal")))
    val expected = t.withColumn("c_acctbal",
      when(col("c_mktsegment") === "BUILDING", money(col("c_acctbal") + 50))
        .otherwise(col("c_acctbal")))
    val got = spark.table("graft_cat.default.customer_u")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("INSERT INTO appends; INSERT OVERWRITE truncates then loads") {
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.tiny")
    spark.sql("CREATE TABLE graft_cat.default.tiny (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_cat.default.tiny VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_cat.default.tiny VALUES (3, 'c')")
    assert(spark.table("graft_cat.default.tiny").count() === 3)
    spark.sql("INSERT OVERWRITE graft_cat.default.tiny VALUES (9, 'z')")
    assert(spark.table("graft_cat.default.tiny").collect().map(_.getLong(0)).toSeq === Seq(9L))
  }
}
