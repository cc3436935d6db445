package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources

/** Event-analytics operators (north-star extension): cohort retention and
  * funnel conversion — the product-analytics verbs every event store gets
  * asked for, as pure declarative plans.
  *
  * Scale shape: both reduce to per-user aggregates first (one shuffle on
  * user_id, state bounded by |users|), then tiny rollups — never a
  * per-event self-join. Week boundaries are ISO (Monday) in both engines;
  * all timestamps leave as epoch-microsecond BIGINTs (SURVEY §2.1.7).
  */
object Analytics {

  /** q_retention_cohort: users bucketed by first-activity week; distinct
    * active users per (cohort week, activity week) — the retention matrix
    * in long form.
    */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("cohort_wk").cast("timestamp")).as("cohort_us"),
              unix_micros(col("wk").cast("timestamp")).as("week_us"),
              col("n_users"))
      .orderBy(col("cohort_us"), col("week_us"))
  }

  /** q_funnel: strictly-ordered view → click → purchase conversion. One
    * conditional-min aggregate per user collapses the event stream to
    * first-occurrence timestamps; the funnel counts are NULL-safe integer
    * comparisons over that tiny frame (a NULL step simply never counts).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.events(spark, dir)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val firsts = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("t_view"),
           min(when(col("event_type") === "click", col("us"))).as("t_click"),
           min(when(col("event_type") === "purchase", col("us"))).as("t_purchase"))
    firsts.agg(
      count(col("t_view")).as("n_view"),
      count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
      count(when(col("t_click") > col("t_view") && col("t_purchase") > col("t_click"), 1))
        .as("n_full_funnel"))
  }
}
