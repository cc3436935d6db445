package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det._
import graft.io.Sources

/** Join surface (SURVEY.md §2 C) — every join family the reference's SQL
  * pass-through exposes, with the physical strategy chosen for scale:
  *
  *  - dimension joins are explicitly broadcast (no shuffle of the fact);
  *  - fact-fact joins are shuffle joins on their keys (sort-merge hint
  *    where the sort is reusable);
  *  - semi/anti joins are planned as such (never as distinct-after-join);
  *  - the theta self-join is bounded by an equi key (per-customer) so the
  *    non-equi condition never degenerates into a global NL join.
  */
object Joins {

  /** q_join_inner: orders ⋈ customer, aggregated by segment. Shuffle hash
    * join on custkey; at scale both sides partition on the key, so the
    * join is a single co-partitioned exchange each.
    */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val o = Sources.orders(spark, dir)
    val c = Sources.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_join_broadcast: fact ⋈ small dim with an explicit broadcast hint —
    * the fact table never shuffles; this is THE 100 TB star-join shape
    * (part is MBs even at full scale; lineitem is the 100 TB side).
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val l = Sources.lineitem(spark, dir)
    val p = Sources.part(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  /** q_join_sortmerge: large-large equi join with a merge hint — at scale
    * both sides are too big to hash-build, and the sort is spillable.
    */
  def joinSortMerge(spark: SparkSession, dir: String): DataFrame = {
    val l = Sources.lineitem(spark, dir)
    val o = Sources.orders(spark, dir)
    l.hint("merge")
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** q_join_left: left outer + null-aware aggregation (customers with zero
    * orders keep a row: count 0, sum coalesced to 0.00 — a NULL decimal
    * sum normalizes differently across engine/arrow paths, so the declared
    * output avoids it).
    */
  def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir)
    val o = Sources.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("sum_price"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_full: full outer of two aggregates on nationkey — the engine
    * shape that also powers upsert/merge (§2 E).
    */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("c_nk"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Sources.supplier(spark, dir)
      .groupBy(col("s_nationkey").cast("long").as("s_nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nk") === col("s_nk"), "full")
      .select(
        coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** q_join_semi: EXISTS as a left-semi join — streams the left side,
    * builds only keys from the right; never materializes the match.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir)
    val o = Sources.orders(spark, dir).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_anti: NOT EXISTS as a left-anti join — also the delete-by-keys
    * engine (§2 E).
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir)
    val o = Sources.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_cross: cartesian product — only ever between bounded inputs
    * (both dims here are catalog-sized at any scale factor).
    */
  def joinCross(spark: SparkSession, dir: String): DataFrame =
    Sources.region(spark, dir).crossJoin(Sources.nation(spark, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** q_mjoin_shipping (TPC-H Q3 shape): 3-table join with selective
    * predicates on every side + revenue aggregation + top-10. Catalyst
    * pushes each filter below its join; AQE sizes the join strategies.
    * The classic "does the engine order and prune a star join" probe.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Sources.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Sources.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val l = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp_ntz"))
    // lineitem stays the streamed side of a sort-merge join — the planner
    // would otherwise broadcast the filtered+pruned fact table at test SFs
    // (observed), a plan that dies at real scale.
    val co = c.join(o, c("c_custkey") === o("o_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    l.hint("merge").join(co, l("l_orderkey") === co("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(discSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q_mjoin_region_volume (TPC-H Q5 shape): 6-table join — region-gated
    * nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier with the classic
    * same-nation constraint; revenue per nation. Dimensions broadcast,
    * facts shuffle on keys.
    */
  def regionVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Sources.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Sources.nation(spark, dir)
    val c = Sources.customer(spark, dir)
    val o = Sources.orders(spark, dir)
    val l = Sources.lineitem(spark, dir)
    val s = Sources.supplier(spark, dir)
    // Build the region-gated order→nation map first (small at any scale
    // relative to lineitem), keep LINEITEM AS THE STREAMED PROBE SIDE —
    // never let the planner broadcast the fact table (its pruned size can
    // fall under the threshold at test SFs, which would be catastrophic at
    // 100 TB).
    val asiaOrders = r.join(n, r("r_regionkey") === n("n_regionkey"))
      .join(c, n("n_nationkey") === c("c_nationkey"))
      .join(o, c("c_custkey") === o("o_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
    // merge hint: lineitem⋈orders is large⋈large at real scale — a sort-
    // merge shuffle join, never a build-side the planner can mis-pick
    l.hint("merge").join(asiaOrders, l("l_orderkey") === asiaOrders("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") && col("c_nationkey") === s("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(discSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q_join_nullsafe: null-safe equality join (<=> / IS NOT DISTINCT FROM)
    * — NULL keys match each other instead of vanishing, the semantics CDC
    * key-reconciliation needs. The nullif(…, 13) manufactures a NULL key
    * bucket from real data. Spark plans <=> as a hash join key (null-safe
    * comparison), so this stays a proper equi join at scale.
    */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    // AGGREGATE-THEN-JOIN: the oracle's literal row-level join emits every
    // (customer, supplier) same-key pair — output quadratic in table size
    // (measured 15× cost at 10× data). The pair COUNT per segment only
    // needs the per-key cardinalities: join the two tiny aggregates on
    // the same null-safe key (<=> matches NULL with NULL, exactly the
    // semantics under test) and multiply. O(n) scan + a 25-row join at
    // any corpus size.
    val c = Sources.customer(spark, dir)
      .groupBy(col("c_mktsegment"), nullif(col("c_nationkey"), lit(13)).as("ck"))
      .agg(count(lit(1)).as("nc"))
    val s = Sources.supplier(spark, dir)
      .groupBy(nullif(col("s_nationkey"), lit(13)).as("sk"))
      .agg(count(lit(1)).as("ns"))
    c.join(s, col("ck") <=> col("sk"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("nc") * col("ns")).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_join_range: strictly-ordered order pairs per customer — the theta
    * self-join `o1 ⋈ o2 ON custkey AND d1 < d2` (the oracle keeps that
    * literal form), computed here WITHOUT any join: per (custkey, date)
    * counts cᵢ, then Σᵢ cᵢ · (prefix count of strictly earlier dates) via
    * one window. A per-key self-join is O(k²) rows in the hot key's task;
    * this form is O(distinct dates) per key — one hash aggregate and one
    * window, and the custkey shuffle is reused by the final aggregate.
    * Customers whose orders all share one date produce zero pairs and are
    * filtered, matching the join's no-output-row behavior.
    */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    // NULL dates never satisfy the oracle's literal d1 < d2 comparison but
    // would count as "earlier than everything" in an ascending window
    // (NULLS FIRST) — drop them up front so the rewrite is equivalent to
    // the join form for ANY input, not just null-free synthetic data
    val perDate = Sources.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("d"))
      .filter(col("d").isNotNull)
      .groupBy(col("custkey"), col("d"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("custkey")).orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perDate
      .withColumn("earlier", coalesce(sum(col("c")).over(w), lit(0L)))
      .groupBy(col("custkey"))
      .agg(sum(col("c") * col("earlier")).cast("long").as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy(col("custkey"))
  }

  /** q_mjoin_topk_revenue: the TPC-H Q3 shape — top-10 highest-revenue
    * unshipped BUILDING orders (ordered before, shipped after the cutoff)
    * — the canonical filter→3-way-join→aggregate→top-k reporting query,
    * completing the mjoin family (Q5-ish region volume, Q12-ish shipping
    * priority) with the one every engine benchmark leads with. Both date
    * filters push to the scans; the selective customer side hash-joins;
    * revenue is the EXACT all-decimal Σ price·(1−disc) (Det.discSum — no
    * double ever sums), so the (revenue desc, date, orderkey) order is a
    * total order both engines share bit-for-bit; the top-10 resolves via
    * the two-phase Rank.topK, never a global sort. Dates surface as
    * exact epoch days (timestamp output would hash on tz formatting).
    */
  def mjoinTopkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp_ntz")
    val c = Sources.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Sources.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderdate"), col("o_orderpriority"))
    val l = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(discSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
    Rank.topK(j.withColumn("__g", lit(0)), Seq("__g"),
        Seq(col("revenue").desc, col("o_orderdate"), col("l_orderkey")), 10, "rk")
      .select(col("rk"), col("l_orderkey"), col("revenue"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("order_epoch_day"),
        col("o_orderpriority"))
      .orderBy(col("rk"))
  }
}
