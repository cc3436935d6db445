package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det._
import graft.io.Sources
import graft.model.Schemas

/** Scan / bulk-load / semi-structured extraction surface (SURVEY.md §2 A).
  */
object Etl {

  /** q_scan_project_filter: projection + predicate that must reach the
    * parquet scan (PushedFilters + pruned ReadSchema — asserted in tests).
    * At 100 TB this is the difference between reading 2 columns and 11.
    */
  def scanProjectFilter(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_extendedprice"))
      .filter(col("l_extendedprice") > 90000.0)
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q_csv_roundtrip: the COPY FROM CSV analogue (postpy dml.copy_from_csv
    * [unverified, SURVEY §0]). Writes a deterministic lineitem slice to a
    * temp CSV (header, empty-string nulls, UTF-8), reads it back with the
    * explicit schema, and aggregates — the declared result must equal the
    * same aggregate straight off parquet, proving the roundtrip lossless.
    * The write happens eagerly; the returned plan reads only the CSV.
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_csv_roundtrip").toFile
    tmp.deleteOnExit()
    val slice = Sources.lineitem(spark, dir).filter(col("l_orderkey") % 5 === 0)
    slice.write.mode("overwrite")
      .option("header", "true").option("nullValue", "")
      // timestampFormat with micros so ns-truncated shipdates survive
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(tmp.getAbsolutePath)
    Sources.csv(spark, tmp.getAbsolutePath, Schemas.lineitem)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("l_quantity")).as("sum_qty"),
           moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q_json_extract: JSON field extraction from a string column — the
    * codegen'd get_json_object path, no UDF.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
}
