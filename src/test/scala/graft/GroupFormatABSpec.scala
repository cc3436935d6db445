package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-7 group-file-format decision (GraftCatalog header doc):
  * the catalog's row-oriented groups and plain parquet must return
  * IDENTICAL results for the A/B's three scan shapes — the formats are
  * semantically interchangeable, and the measured perf table in the
  * header (parquet 1.5–3.4× faster scan-bound at sf1) is the only
  * difference. If a future change makes the catalog scan diverge from
  * the parquet read on any of these shapes, this spec is the tripwire.
  */
class GroupFormatABSpec extends AnyFunSuite with SparkFixture {

  test("row-format catalog scan == parquet scan on the A/B shapes") {
    spark.conf.set("spark.sql.catalog.graft_ab", "graft.catalog.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_ab.default.li_ab")
    val li = io.Sources.lineitem(spark, sfDir)
    li.createOrReplaceTempView("li_ab_src")
    spark.sql("CREATE TABLE graft_ab.default.li_ab (" +
      li.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") + ")")
    spark.sql("INSERT INTO graft_ab.default.li_ab SELECT * FROM li_ab_src")
    val rowsT = spark.table("graft_ab.default.li_ab")

    // wide: full-width row hash — any column misread/reorder flips it
    def wide(t: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
      val cols = li.schema.fieldNames.map(col).toIndexedSeq // fixed order both sides
      // decimal sum: a long sum of 64-bit hashes overflows under ANSI
      t.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head.getDecimal(0)
    }
    assert(wide(rowsT) === wide(li))

    // narrow: 2-column aggregate
    def narrow(t: org.apache.spark.sql.DataFrame) =
      t.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(narrow(rowsT) === narrow(li))

    // filtered narrow: predicate + projection (exercises the catalog's
    // stats pruning path against parquet's filter pushdown)
    def filtered(t: org.apache.spark.sql.DataFrame) =
      t.filter(col("l_shipdate") >= "1995-01-01")
        .agg(sum("l_extendedprice"), count(lit(1))).head
    val (a, b) = (filtered(rowsT), filtered(li))
    assert(a.getLong(1) === b.getLong(1))
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6)

    spark.sql("DROP TABLE IF EXISTS graft_ab.default.li_ab")
  }
}
