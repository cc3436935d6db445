package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det._
import graft.io.Sources

/** Relational query surface (SURVEY.md §2 B/C/D/F) — the capability a
  * postpy user gets by passing SQL through sql.select [unverified, §0],
  * re-expressed as declarative DataFrame plans so Catalyst gets full
  * pushdown/pruning/join-selection freedom.
  *
  * Scale notes are attached per operator: the test data is tiny, but every
  * plan here is shaped for the 1000-executor / 100 TB case — partial
  * aggregation before shuffle, broadcast for dimension tables, merge hints
  * for fact-fact joins, and no driver-side collection anywhere.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (flagship). Hash aggregate with
    * map-side partial aggregation; group-key cardinality is tiny (RF×LS)
    * so the shuffle moves only partial states, not rows — the canonical
    * 100 TB-safe aggregation shape.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Sources.lineitem(spark, dir)
    l.filter(col("l_quantity") <= 45)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        discSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        moneySum(col("l_quantity")).as("sum_qty"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
