package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory
  * whose query keys appear here) and §7.
  *
  * Every key in `queries` has a DuckDB twin in `oracleSql`; both obey the
  * determinism rules of SURVEY.md §2.1 (decimal money sums, round-6 stats,
  * total-order tiebreaks, UTC).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing_summary" -> Relational.pricingSummary,
  )

  /** DuckDB oracle twins. Table references are absolute parquet paths via
    * the {dir} placeholder-free convention: the driver substitutes the sf
    * dir for the parquet file path pattern below (FIXTURES.md §2 verified
    * pattern: SELECT ... FROM '<dir>/<name>.parquet').
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_quantity <= 45
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
