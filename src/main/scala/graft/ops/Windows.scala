package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Det._
import graft.io.Sources

/** Window functions, global sort/limit, and set operations (SURVEY.md
  * §2 F). Every window ORDER BY carries a unique-key tiebreak
  * (SURVEY §2.1.3) so rank/lag results are total-order deterministic.
  *
  * Scale: window state is bounded per partition key (customer / user /
  * segment — all high-cardinality keys, so partitions stay small and
  * parallelism stays wide); global top-k is TakeOrderedAndProject (per-
  * partition heap + driver merge of k rows, never a full global sort).
  */
object Windows {

  /** q_window_rank: rank / dense_rank / row_number per market segment —
    * the §2 F demonstration of the ranking-window CONSTRUCTS themselves
    * (PlanGate-allowlisted). SCALE NOTE: c_mktsegment is a 5-value
    * domain, so this exact shape at 100 TB sorts N/5 rows per task; a
    * production full-table ranking goes through Rank.rankExact /
    * Rank.topK (see q_gini / q_topk_per_group), which compute the same
    * numbers with grid-grain parallelism.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Sources.customer(spark, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
      .orderBy(col("c_custkey"))
  }

  /** q_window_running: running money sum per customer over order history
    * (rows frame). Decimal accumulation keeps it exact and
    * order-of-merge-independent.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"),
        asOut(sum(money(col("o_totalprice"))).over(w)).as("run_sum"))
      .orderBy(col("o_orderkey"))
  }

  /** q_window_range: value-range frame — count and money sum of each
    * customer's orders in the trailing 30 days. The order key is an
    * epoch-day BIGINT on both engines (timestamp range frames differ in
    * unit semantics across engines; integer days do not).
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, Window.currentRow)
    Sources.orders(spark, dir)
      .withColumn("day", day)
      .select(
        col("o_orderkey"), col("o_custkey"), col("day"),
        count(lit(1)).over(w).as("n_30d"),
        asOut(sum(money(col("o_totalprice"))).over(w)).as("sum_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** q_window_time_range: TIME-interval range frame — the literal
    * `RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW` SQL
    * surface over the timestamp order key (q_window_range's epoch-day
    * form is the engine-portable fallback; this key proves the interval
    * spelling itself agrees between engines on day-granularity NTZ data
    * under UTC). RANGE frames are peer-inclusive, so same-date rows share
    * a frame — deterministic without a tiebreak.
    */
  def windowTimeRange(spark: SparkSession, dir: String): DataFrame = {
    Sources.orders(spark, dir).createOrReplaceTempView("wtr_orders")
    spark.sql(
      """SELECT o_custkey, unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS od_us,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_90d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_90d
        |FROM wtr_orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, od_us""".stripMargin)
  }

  /** q_window_time_range_hours: the INTERVAL range frame over SUB-DAY
    * timestamps — events carry microsecond-granular event times, so the
    * 6-hour frame bound actually discriminates between rows hours apart
    * (the day-granular q_window_time_range can't distinguish an off-by-
    * hours frame boundary; this key pins the inclusion semantics where it
    * matters). Frame aggregates are exact integers (count + event_id sum)
    * so no float-summation order can diverge between engines.
    */
  def windowTimeRangeHours(spark: SparkSession, dir: String): DataFrame = {
    Sources.events(spark, dir).createOrReplaceTempView("wtrh_events")
    spark.sql(
      """SELECT event_id, user_id, unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_6h,
        |  CAST(SUM(event_id) OVER w AS BIGINT) AS sum_eid_6h
        |FROM wtrh_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 6 HOURS PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  /** q_window_ntile: distribution window functions — quartile bucketing
    * (ntile), percent_rank and cume_dist per market segment. The rank
    * divisions are exact integer-derived doubles ((rank-1)/(n-1), k/n) —
    * identical IEEE ops in both engines, no rounding needed. Total order
    * within each partition via the custkey tiebreak.
    */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Sources.customer(spark, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** q_window_lag_lead: per-user event deltas (lag/lead). Microsecond
    * epoch arithmetic — identical integer ops in Spark (unix_micros) and
    * DuckDB (epoch_us).
    */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — under the pinned
    // UTC session the cast is value-preserving.
    val micros = unix_micros(col("ts").cast("timestamp"))
    Sources.events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        (micros - lag(micros, 1).over(w)).as("delta_us"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy(col("event_id"))
  }

  /** q_window_distinct: RUNNING DISTINCT COUNT per user — how many
    * distinct event types each user has produced so far at every event.
    * Spark has no DISTINCT aggregates over windows; the engine-native
    * form is size(collect_set(...)) over the running frame (set state is
    * bounded by the distinct-value cardinality — fine for enum-like
    * columns like event_type; for high-cardinality columns switch to the
    * HLL sketch in an Aggregator). The oracle runs DuckDB's NATIVE
    * windowed count(DISTINCT …) — the gate proves the workaround is
    * semantically identical to the real thing.
    */
  def windowDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.events(spark, dir)
      .select(col("event_id"), col("user_id"),
              size(collect_set(col("event_type")).over(w)).cast("long").as("n_types_so_far"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q_window_first_last: positional window values — each order alongside
    * its customer's first, latest, and second order price. first_value
    * uses the default running frame; last/nth need the FULL partition
    * frame (unboundedPreceding..unboundedFollowing) — with the default
    * frame last_value is just the current row, the classic SQL trap, so
    * the frame is explicit and identical in the oracle twin.
    */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val wRun = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = wRun.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Sources.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_totalprice")).over(wRun).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
      .orderBy(col("o_orderkey"))
  }

  /** q_topk_per_group: top-3 orders by price per market segment — the
    * two-phase Rank.topK form: c_mktsegment has 5 values, so a single
    * per-segment row_number window would sort N/5 rows on 5 tasks at
    * scale (the q_rfm r9 anti-pattern); the local pre-rank keeps ≤ 3
    * rows per (input partition, segment), the final rank sees only that
    * bounded survivor frame.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Sources.orders(spark, dir)
    val c = Sources.customer(spark, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    graft.ops.Rank.topK(joined, Seq("c_mktsegment"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3, "rn")
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** q_sort_limit_topk: global ORDER BY + LIMIT → TakeOrderedAndProject
    * (per-partition top-k, driver merges k·p rows — never a global sort).
    */
  def sortLimitTopk(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** q_union_all: UNION ALL of key streams + count per key. */
  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val a = Sources.customer(spark, dir).select(col("c_custkey").as("custkey"))
    val b = Sources.orders(spark, dir).select(col("o_custkey").as("custkey"))
    a.unionByName(b)
      .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("custkey"))
  }

  /** q_union_distinct: UNION with dedup. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val a = Sources.supplier(spark, dir).select(col("s_suppkey").as("suppkey"))
    val b = Sources.lineitem(spark, dir).select(col("l_suppkey").as("suppkey"))
    a.union(b).distinct().orderBy(col("suppkey"))
  }

  /** q_intersect: INTERSECT (set semantics). */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    val a = Sources.customer(spark, dir).select(col("c_custkey").as("custkey"))
    val b = Sources.orders(spark, dir).select(col("o_custkey").as("custkey"))
    a.intersect(b).orderBy(col("custkey"))
  }

  /** q_except: EXCEPT (set semantics). */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    val a = Sources.customer(spark, dir).select(col("c_custkey").as("custkey"))
    val b = Sources.orders(spark, dir).select(col("o_custkey").as("custkey"))
    a.except(b).orderBy(col("custkey"))
  }

  /** q_except_all: EXCEPT ALL — MULTISET difference (per-row multiplicity
    * max(count_a − count_b, 0)), the bag semantics q_except's distinct
    * form erases: "how many of supplier X's odd-order line items are NOT
    * accounted for by the mod-3 slice" keeps COUNTS, which is what
    * reconciliation/diff workloads actually need. The post-op aggregate
    * declares the multiplicities themselves, so the gate proves the bag
    * algebra, not just membership. Spark plans EXCEPT ALL as a
    * count-difference aggregate + generate (no sort) — the scale shape
    * is one hash shuffle on the value, same as the aggregate it feeds.
    */
  def exceptAllKeys(spark: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val a = li.filter(col("l_orderkey") % 2 === 1).select(col("l_suppkey"))
    val b = li.filter(col("l_orderkey") % 3 === 0).select(col("l_suppkey"))
    a.exceptAll(b).groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_suppkey"))
  }

  /** q_intersect_all: INTERSECT ALL — multiset intersection
    * (min(count_a, count_b) per value); same declaration pattern as
    * q_except_all. */
  def intersectAllKeys(spark: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val a = li.filter(col("l_orderkey") % 2 === 1).select(col("l_suppkey"))
    val b = li.filter(col("l_orderkey") % 3 === 0).select(col("l_suppkey"))
    a.intersectAll(b).groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_suppkey"))
  }

  /** q_window_exclude: the SQL-standard frame EXCLUDE clause (peer-group
    * / current-row exclusion — "how does each row compare to the REST of
    * its partition"), which Spark's window frames do not support. The
    * engine-native form is algebraic: sum-excluding-current = partition
    * sum − own value, count-excluding = n − 1, avg-of-others = the one
    * shared IEEE division — exact decimal cents keep the subtraction
    * order-independent. Gated against DuckDB's NATIVE `EXCLUDE CURRENT
    * ROW` frame, proving the workaround row-identical to the real
    * construct (the q_window_distinct pattern). One partition shuffle,
    * no ordering needed at all — cheaper than the ordered-frame spelling.
    */
  def windowExclude(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val w = Window.partitionBy(col("c_mktsegment"))
    val cents = graft.Det.cents(col("c_acctbal"))
    Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
      .withColumn("n_peers", (count(lit(1)).over(w) - 1).cast("long"))
      .withColumn("peer_cents", sum(col("cents")).over(w) - col("cents"))
      .filter(col("n_peers") > 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("n_peers"),
        r6(col("peer_cents").cast("double") /
           (lit(100.0) * col("n_peers").cast("double"))).as("peer_avg"))
      .orderBy(col("c_custkey"))
  }
}
