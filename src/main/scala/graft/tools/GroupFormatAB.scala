package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: the catalog's row-oriented group-file format vs parquet for
  * SCAN-BOUND analytics (the round-6 verdict's "columnar group files"
  * question). Loads lineitem at SPARK_GRAFT_SF_DIR into (a) a GraftCatalog
  * table and (b) a plain parquet directory, then times three scan shapes
  * (min of 3 passes after a warm-up):
  *   wide   — COUNT over a full-width materializing predicate
  *   narrow — 2-column aggregate (column pruning's best case)
  *   filter — selective predicate + narrow projection
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.GroupFormatAB"
  * Results are documented in GraftCatalog's header; GroupFormatABSpec pins
  * that both paths return identical results.
  */
object GroupFormatAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft_ab", "graft.catalog.GraftCatalog")

    val li = graft.io.Sources.lineitem(spark, sfDir)
    val n = li.count()
    println(s"[ab] lineitem rows: $n")

    // (a) catalog table — INSERT routes through the row-format writer
    spark.sql("DROP TABLE IF EXISTS graft_ab.default.li_rows")
    li.createOrReplaceTempView("li_src")
    spark.sql("CREATE TABLE graft_ab.default.li_rows (" +
      li.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") + ")")
    spark.sql("INSERT INTO graft_ab.default.li_rows SELECT * FROM li_src")
    // (b) parquet copy (same row count, fresh files — not the testdata
    // ones, so compression/layout is what OUR writer would produce)
    val pqDir = java.nio.file.Files.createTempDirectory("ab_pq").toString
    li.write.mode("overwrite").parquet(pqDir)

    def time(label: String, f: () => Long): Double = {
      f() // warm-up
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f(); val dt = (System.nanoTime() - t0) / 1e9
        require(r >= 0); dt
      }.min
      println(f"[ab] $label%-28s ${t}%8.3f s")
      t
    }

    val rowsT = spark.table("graft_ab.default.li_rows")
    val pqT = spark.read.parquet(pqDir)

    for ((name, t) <- Seq(("rows", rowsT), ("parquet", pqT))) {
      val allCols = t.columns.map(col).toIndexedSeq
      time(s"$name wide (hash all cols)",
        () => t.select(xxhash64(allCols: _*).cast("decimal(38,0)").as("h"))
               .agg(sum("h")).count())
      time(s"$name narrow sum(qty) by flag",
        () => t.groupBy("l_returnflag").agg(sum("l_quantity")).count())
      time(s"$name filtered narrow",
        () => t.filter(col("l_shipdate") >= "1995-01-01")
               .select(sum(col("l_extendedprice"))).count())
    }
    spark.sql("DROP TABLE IF EXISTS graft_ab.default.li_rows")
    spark.stop()
  }
}
