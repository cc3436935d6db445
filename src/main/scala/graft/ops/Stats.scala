package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sources

/** Statistical-testing and association-mining operators (north-star
  * extension): the two-sample tests a drift monitor or A/B harness runs,
  * plus market-basket association mining — all as exact dataflow.
  *
  * Portability pattern throughout (the q_outlier_zscore rule): keep
  * every intermediate EXACT (integer counts, decimal money sums) for as
  * long as possible, then finalize with ONE shared IEEE expression tree
  * rounded to 6 dp — so no comparison boundary can flip between engines.
  */
object Stats {

  /** q_ks_test: two-sample Kolmogorov–Smirnov statistic between the
    * BUILDING and MACHINERY segments' account balances — the
    * distribution-shift detector behind data-drift monitors (chisq tests
    * categorical independence; KS tests continuous distribution
    * equality). D = max |F1(x) − F2(x)| over the pooled support. The
    * whole statistic is computed in INTEGER arithmetic: per-value counts,
    * running cumulatives, and d_num = max |cum1·n2 − cum2·n1| (a BIGINT),
    * so the max — the only order-sensitive step — is exact; the single
    * division d_num/(n1·n2) happens once at the end. One aggregate over
    * distinct balances + one ordered window — nothing quadratic.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val two = Sources.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("c_acctbal"))
    val perValue = two.groupBy(col("c_acctbal"))
      .agg(count(when(col("c_mktsegment") === "BUILDING", 1)).as("c1"),
           count(when(col("c_mktsegment") === "MACHINERY", 1)).as("c2"))
    val tot = perValue.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // global ordered window over DISTINCT balances only (bounded well below
    // the row count); at extreme cardinality switch to a range-partitioned
    // pre-aggregation — the statistic itself is unchanged
    val w = Window.orderBy(col("c_acctbal"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        r6(col("d_num").cast("double") /
           (col("n1").cast("double") * col("n2").cast("double"))).as("d"))
  }

  /** q_ttest: Welch's two-sample t-test of `value` between purchase and
    * click events — "did the metric move between arms", the A/B
    * work-horse that (unlike Student's t) does not assume equal
    * variances. Moments are exact (decimal sums via Det.money, integer
    * counts) and collapse in ONE conditional aggregate over the scan —
    * no shuffle carries more than a single row. t and the
    * Welch–Satterthwaite df come out of one shared double tree, round-6.
    */
  def ttest(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{money, r6}
    def side(t: String, c: org.apache.spark.sql.Column) = when(col("event_type") === t, c)
    val m = Sources.events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      // n counts NON-NULL measures (count over the money expression, not
      // the row) — a NULL value must not enter n while being absent from
      // the sums, or mean and variance are biased
      .agg(count(side("purchase", money(col("value")))).cast("double").as("n1"),
           sum(side("purchase", money(col("value")))).cast("double").as("s1"),
           sum(side("purchase", money(col("value")) * money(col("value")))).cast("double").as("q1"),
           count(side("click", money(col("value")))).cast("double").as("n2"),
           sum(side("click", money(col("value")))).cast("double").as("s2"),
           sum(side("click", money(col("value")) * money(col("value")))).cast("double").as("q2"))
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val v2 = (col("q2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1)
    val se1 = v1 / col("n1")
    val se2 = v2 / col("n2")
    m.filter(col("n1") > 1 && col("n2") > 1)
      .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        r6((col("s1") / col("n1") - col("s2") / col("n2")) / sqrt(se1 + se2)).as("t"),
        r6((se1 + se2) * (se1 + se2) /
           (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1))).as("df"))
  }

  /** q_anova: one-way ANOVA F-test of account balance across ALL market
    * segments — the >2-arm generalization of q_ttest ("did ANY arm
    * move"), the omnibus test an experimentation platform runs before
    * pairwise drill-down. Per-segment moments (n, Σx, Σx²) are EXACT
    * BIGINTs over integer cents in one aggregate; the 5-row segment
    * census then collapses to SSB/SSW. Each per-group term S_i²/n_i is
    * one deterministic IEEE expression of exactly-representable integers
    * (S_i < 2⁵³); the cross-group sums of those doubles can drift by
    * ulps with summation order — absorbed by round-6, the q_entropy
    * argument. Output: k, N, F, and eta² (variance explained).
    * Scale: one segment-grain aggregate (map-side partial), then a
    * k-row frame — nothing downstream of the scan is data-sized.
    */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val g = Sources.customer(spark, dir)
      .select(col("c_mktsegment").as("seg"), cents(col("c_acctbal")).as("v"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
           sum(col("v") * col("v")).as("q"))
    val t = col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    val m = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s")).as("ss"), sum(col("q")).cast("double").as("qq"),
      sum(t).as("tt"))
    val ssb = col("tt") -
      col("ss").cast("double") * col("ss").cast("double") / col("nn").cast("double")
    val ssw = col("qq") - col("tt")
    val sst = ssb + ssw
    m.filter(col("k") > 1 && col("nn") > col("k"))
      .select(col("k"), col("nn").as("n_total"),
        r6((ssb / (col("k") - 1).cast("double")) /
           (ssw / (col("nn") - col("k")).cast("double"))).as("f"),
        r6(ssb / sst).as("eta_sq"))
  }

  /** q_market_basket: association mining over order baskets — for every
    * pair of parts co-ordered at least twice, support count and LIFT
    * (how much more often they co-occur than independence predicts): the
    * recommender/affinity primitive. Pair generation is the
    * q_triangle_count shape: per-order sorted distinct part list
    * (baskets are small and bounded by order size), pairs emitted
    * MAP-SIDE by a higher-order transform — never an |items|² join.
    * Counts stay integers; lift = n_ab·N/(n_a·n_b) is the one final
    * double, round-6. Output bounded: top-50 by (n_ab desc, a, b).
    */
  def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    // r13 (guide §2.3/§2.4, VERDICT r12 #6): ONE exchange over the fact.
    // The r12 form shuffled lineitem THREE times — a (orderkey, partkey)
    // distinct, then groupBy(orderkey) for baskets, plus groupBy(partkey)
    // for item counts (exchange reuse caught only identical subtrees).
    // collect_set already dedups, so the distinct pre-pass was redundant:
    // aggregate straight to the per-order sorted part list (map-side
    // partial collect_set shrinks the shuffle too), lazily checkpoint
    // that small basket frame, and derive EVERYTHING from it — n_orders
    // is its row count (1-row agg), item counts re-explode it (per-order
    // sets ⇒ count per part = #orders containing it), pairs as before.
    val perOrder = Sources.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      .localCheckpoint(eager = false) // 3 consumers; the one final job materializes it
    val nOrders = perOrder.agg(count(lit(1)).as("n_orders"))
    val itemCounts = perOrder.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    // per-order pair explosion, map-side: sorted distinct parts -> (a<b) pairs
    val pairs = perOrder
      .select(explode(flatten(transform(col("parts"), (x, i) =>
        transform(slice(col("parts"), i + lit(2), size(col("parts"))),
                  y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    // item counts are |parts| rows — broadcast both lookup sides (left to
    // AQE's post-agg size estimate these degrade to sort-merge joins)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("l_partkey", "a").withColumnRenamed("n_item", "n_a")), Seq("a"))
      .join(broadcast(itemCounts.withColumnRenamed("l_partkey", "b").withColumnRenamed("n_item", "n_b")), Seq("b"))
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        r6(col("n_ab").cast("double") * col("n_orders").cast("double") /
           (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(50)
  }

  /** q_zipf_slope: Zipf's-law fit over the token frequency spectrum —
    * OLS slope of ln(freq) on ln(rank) across the top-500 ranks (a
    * natural corpus should sit near −1; a synthetic or degenerate one
    * drifts — the corpus-health check sibling of q_entropy). Ranks are
    * assigned by the total order (count desc, token asc) so both engines
    * agree on every (rank, freq) point; the ln-sums drift by ulps across
    * sum orders — absorbed by round-6 (the q_entropy argument). Bounded:
    * the regression runs over exactly 500 rows.
    *
    * Scale shape (round 9): the top-500 is taken with orderBy+limit —
    * a distributed TakeOrderedAndProject (per-partition top-500, then a
    * 500·P-row driver-side merge) — NOT a global window over the whole
    * vocabulary (the round-8 form moved every distinct token through one
    * WindowExec task; at web-corpus vocab that is a scale-killer). The
    * row_number window that assigns ranks runs AFTER the limit, over
    * exactly 500 rows.
    */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val counts = Sources.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .orderBy(col("c").desc, col("tok")).limit(500)
      .withColumn("rk", row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      .select(log(col("rk").cast("double")).as("x"), log(col("c").cast("double")).as("y"))
    val m = ranked.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = cov / varX
    m.select(col("n").cast("long").as("n_ranks"),
      r6(slope).as("slope"),
      r6((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
      r6(cov * cov / (varX * varY)).as("r2"))
  }

  /** q_weighted_median: WEIGHTED median unit price per return flag —
    * price weighted by quantity, i.e. "the price the median shipped UNIT
    * paid", the robust center a plain median-of-rows misstates when line
    * sizes vary. Convention: the LOWER weighted median (smallest price
    * with cumulative weight ≥ half the total) — a deterministic pick, no
    * interpolation. All arithmetic EXACT: prices in integer cents,
    * weights exact integral quantities, the selection test
    * 2·cum ≥ W in BIGINT — the only double op is the final cents→price
    * rendering. One aggregate to (flag, price) grain, one flag-partitioned
    * ordered window over DISTINCT prices (bounded by the price-cents
    * domain, same argument as q_skyline — at open-ended domains switch to
    * the two-pass t-digest in ops/Quantile).
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val per = Sources.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
              cents(col("l_extendedprice")).as("p"),
              col("l_quantity").cast("long").as("q"))
      .groupBy(col("flag"), col("p")).agg(sum(col("q")).as("w"))
    val wRun = Window.partitionBy(col("flag")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum", sum(col("w")).over(wRun))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("flag"))))
      .filter(col("cum") * 2 >= col("tw"))
      .groupBy(col("flag"))
      .agg(min(col("p")).as("med_cents"), max(col("tw")).as("total_weight"))
      .select(col("flag"), r6(col("med_cents").cast("double") / 100.0).as("w_median"),
              col("total_weight"))
      .orderBy(col("flag"))
  }

  /** q_benford: Benford's-law first-digit audit of order totals — the
    * classic fraud / synthetic-data smell test (natural multiplicative
    * quantities put ~30.1% of first digits at 1; fabricated numbers
    * don't). First digit via the DECIMAL(18,2) string rendering (both
    * engines print plain '1234.56' — no scientific notation, no locale),
    * counts exact, observed share and the log10(1+1/d) expectation as
    * one shared double tree round-6. One tiny aggregate; 9 output rows.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{money, r6}
    val digits = Sources.orders(spark, dir)
      .filter(col("o_totalprice") >= 1.0)
      .select(substring(money(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("n_total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        r6(col("n").cast("double") / col("n_total").cast("double")).as("pct"),
        r6(log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))).as("benford_pct"))
      .orderBy(col("digit"))
  }

  /** q_skyline: the 2-D PARETO FRONTIER of parts (minimize retail price,
    * maximize size) — multi-objective shortlisting ("no other part is
    * both cheaper and bigger"). Linear window form, never an all-pairs
    * dominance join: collapse to the best (max) size per exact price
    * cent, then a point survives iff its size strictly exceeds the
    * running max size over all STRICTLY cheaper points — a RANGE frame
    * on integer cents ending 1 PRECEDING, identical in both engines.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val perPrice = Sources.part(spark, dir)
      .select(graft.Det.cents(col("p_retailprice")).as("price_cents"),
              col("p_size"), col("p_partkey"))
      .groupBy(col("price_cents"))
      .agg(max(col("p_size")).as("size"), count(lit(1)).as("n_at_price"))
    val cheaper = Window.orderBy(col("price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    perPrice
      .withColumn("best_cheaper", max(col("size")).over(cheaper))
      .filter(col("best_cheaper").isNull || col("size") > col("best_cheaper"))
      .select(col("price_cents"), col("size").cast("long").as("size"), col("n_at_price"))
      .orderBy(col("price_cents"))
  }

  /** q_mad_outliers: MEDIAN-ABSOLUTE-DEVIATION outlier gate per segment —
    * the robust sibling of q_outlier_zscore: mean/stddev are dragged by
    * the very outliers they hunt, median/MAD are not (50% breakdown
    * point). score = |x − median| / MAD on the ROUNDED score (round-6
    * both sides, so the boundary cannot flip). The 1.8 gate, not the
    * textbook 3.5: uniform-ish balances bound the score at 2.0 (the
    * q_outlier_zscore argument), so 3.5 would pass vacuously — 1.8 keeps
    * a genuine ~10% two-tail at every scale factor. Flagged at > 1.8
    * score; medians are
    * exact interpolated percentiles (the q_winsorize portability rule).
    * Two tiny aggregates broadcast back — never a full-table sort.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val c = Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal").cast("double").as("v"))
    val med = c.groupBy(col("c_mktsegment"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val mad = c.join(broadcast(med), Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"), col("med"))
      .agg(expr("percentile(abs(v - med), 0.5)").as("mad"))
    c.join(broadcast(mad), Seq("c_mktsegment"))
      .filter(col("mad") > 0)
      .withColumn("score", r6(abs(col("v") - col("med")) / col("mad")))
      .filter(col("score") > 1.8)
      .select(col("c_custkey"), col("c_mktsegment"), col("score"))
      .orderBy(col("c_custkey"))
  }

  /** q_gini: GINI COEFFICIENT of customer order spend per market segment
    * — revenue-concentration ("do 20% of customers drive 80% of spend"),
    * the inequality audit behind pricing and sampling decisions. The
    * exact sorted-rank form G = Σ(2i − n − 1)·x_i / (n·Σx) over per-
    * customer totals in (spend, custkey) order: spend is exact integer
    * cents, ranks are integers, so numerator and denominator are exact
    * BIGINTs and the one division is shared, round-6. One customer-grain
    * aggregate, then the rank comes from Rank.rankExact (two-phase over a
    * spend grid PROBED from the checkpointed frame — Rank.gridFor, ≈256
    * chunks/segment at any domain; a per-SEGMENT row_number window
    * would be 5 tasks at 100 TB — the q_rfm r9 anti-pattern).
    */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{money, r6}
    val spend = Sources.orders(spark, dir)
      .join(broadcast(Sources.customer(spark, dir)),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("cents"))
      .localCheckpoint(eager = false) // consumed by census + rank join (lazy r12 — the grid probe materializes)
    Rank.rankExact(spend, "c_mktsegment", col("cents"), col("c_custkey"),
        Rank.gridFor(spend, col("cents")), desc = false, "i")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           sum(col("cents")).as("total_cents"),
           sum((col("i") * 2 - 1) * col("cents")).as("weighted"))
      .filter(col("total_cents") > 0)
      .select(col("c_mktsegment"), col("n_customers"),
        // Σ(2i−n−1)x = Σ(2i−1)x − n·Σx — both BIGINT-exact
        r6((col("weighted") - col("n_customers") * col("total_cents")).cast("double") /
           (col("n_customers") * col("total_cents")).cast("double")).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_pareto_topn: the 80/20 question made exact — per segment, how
    * many top customers (by spend) cover 80% of revenue, and what share
    * of the customer base that is. The operational complement of q_gini
    * (gini scores concentration; this names the head size a campaign
    * must reach). Exact integer cents; the cumulative share test is
    * 5·cum >= 4·total in BIGINTs, so the 80% boundary cannot flip.
    * Rank + cumulative spend come from Rank.rankCumsum (two-phase over
    * the same probed spend grid as q_gini, Rank.gridFor — a per-SEGMENT
    * rank/cumsum window would be 5 tasks at 100 TB, the r9 anti-pattern).
    */
  def paretoTopN(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val spend = Sources.orders(spark, dir)
      .join(broadcast(Sources.customer(spark, dir)),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg((sum(graft.Det.money(col("o_totalprice"))) * 100).cast("long").as("cents"))
      .localCheckpoint(eager = false) // consumed by census + rank join (lazy r12 — the grid probe materializes)
    Rank.rankCumsum(spend, "c_mktsegment", col("cents"), col("c_custkey"),
        col("cents"), Rank.gridFor(spend, col("cents")), desc = true,
        "rk", "cum", "n_customers", "total")
      // first rank whose cumulative share reaches 80% — integer test
      .filter(col("cum") * 5 >= col("total") * 4)
      .groupBy(col("c_mktsegment"), col("n_customers"), col("total"))
      .agg(min(col("rk")).as("n_top80"))
      .select(col("c_mktsegment"), col("n_customers"), col("n_top80"),
        r6(col("n_top80").cast("double") / col("n_customers").cast("double")).as("head_share"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_freshness: per-stream staleness audit — each event type's last
    * event time and its lag behind the freshest stream (the DQ monitor
    * that catches a dead producer before a dashboard does). Exact
    * integer microseconds; one tiny aggregate + a broadcast 1-row max.
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val last = Sources.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(max(unix_micros(col("ts").cast("timestamp"))).as("last_us"),
           count(lit(1)).as("n_events"))
    val global = last.agg(max(col("last_us")).as("global_us"))
    last.crossJoin(broadcast(global))
      .select(col("event_type"), col("n_events"), col("last_us"),
              (col("global_us") - col("last_us")).as("lag_us"))
      .orderBy(col("event_type"))
  }

  /** q_source_similarity: the SOURCE REDUNDANCY MATRIX — pairwise cosine
    * similarity of per-source token-frequency vectors, the signal behind
    * mixture planning ("these two crawls are near-identical, down-weight
    * one") and dedup targeting. Exact integer token counts; dot products
    * and norms are exact BIGINT sums; cosine is one shared
    * dot/sqrt(na·nb) tree round-6. The token dimension is
    * vocabulary-bounded, so the pair join is |vocab|·|sources|² at most
    * — flat in corpus size past the first count aggregate.
    */
  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val counts = Sources.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val norms = counts.groupBy(col("source"))
      .agg(sum(col("c") * col("c")).as("n2"))
    val dots = counts.as("x").join(counts.as("y"),
        col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("a"), col("y.source").as("b"))
      .agg(sum(col("x.c") * col("y.c")).as("dot"))
    dots
      .join(broadcast(norms.select(col("source").as("a"), col("n2").as("na"))), Seq("a"))
      .join(broadcast(norms.select(col("source").as("b"), col("n2").as("nb"))), Seq("b"))
      .select(col("a"), col("b"),
        r6(col("dot").cast("double") /
           sqrt(col("na").cast("double") * col("nb").cast("double"))).as("cos"))
      .orderBy(col("a"), col("b"))
  }

  /** q_psi: Population Stability Index of the event-value distribution,
    * first half-month vs second (days 1-15 vs 16-30) per event_type — THE
    * standard model-monitoring drift score (PSI < 0.1 stable, > 0.25
    * action). Values land in 10 fixed cents-derived bands; counts get
    * Laplace +1 smoothing (exact integers — no empty-bucket infinities);
    * PSI = Σ (p−q)·ln(p/q) as one shared double tree over exact integer
    * inputs, round-6 (the q_entropy ln argument). Everything is one
    * aggregate at (type, band) grain + a |types|-row rollup.
    */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val banded = Sources.events(spark, dir)
      .select(col("event_type"),
              (datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")) <= lit(19723 + 14)).as("is_a"),
              least(lit(9L), floor(cents(col("value")) / 1000L)).cast("long").as("band"))
    val counts = banded
      .groupBy(col("event_type"), col("band"))
      .agg(count(when(col("is_a"), 1)).as("ca"), count(when(!col("is_a"), 1)).as("cb"))
    val tot = Window.partitionBy(col("event_type"))
    counts
      .withColumn("na", sum(col("ca")).over(tot))
      .withColumn("nb", sum(col("cb")).over(tot))
      // Laplace smoothing: +1 per band, +10 per denominator (10 bands)
      .withColumn("p", (col("ca") + 1L).cast("double") / (col("na") + 10L).cast("double"))
      .withColumn("q", (col("cb") + 1L).cast("double") / (col("nb") + 10L).cast("double"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_bands"),
           r6(sum((col("p") - col("q")) * log(col("p") / col("q")))).as("psi"))
      .orderBy(col("event_type"))
  }

  /** q_spearman: Spearman rank correlation between per-customer order
    * count and total spend — "do frequent buyers also spend more",
    * the monotone-association measure that (unlike Pearson) ignores the
    * spend distribution's heavy tail. Ranks are GLOBAL but never computed
    * by a single-partition window: Rank.rankExact's two-phase grid rank
    * (census → broadcast offsets → per-chunk row_number) keeps full
    * parallelism; ties then collapse to the textbook average rank via
    * min+max over each tie group (doubled so it stays an exact BIGINT).
    *
    * rho = Pearson over the tie-averaged ranks, computed on CENTERED
    * doubled ranks c = 2·avg_rank − (n+1): every moment is an exact
    * BIGINT (|Σc²| ≤ n(n²−1)/3 < 2⁵³ for n ≤ ~3·10⁵ — holds through sf1
    * with 30× headroom; beyond that move the three moments to
    * DECIMAL(38,0), the statistic is unchanged), finalized by one shared
    * IEEE tree (div, two sqrts), round-6. Σc = 0 by construction, so no
    * mean subtraction survives to floating point.
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val per = Sources.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"), sum(cents(col("o_totalprice"))).as("y"))
      .withColumn("__all", lit(0))
      .localCheckpoint(eager = false) // consumed by the grid probe + 2 censuses + 2 rank joins (lazy r12)
    // equi-depth grids PROBED from the checkpointed frame — BOTH metrics
    // in one 1-row aggregate job (Rank.gridsFor, r12 opt), not hard-coded
    // domain constants: the grid re-sizes itself under any
    // generator/domain shift (VERDICT r10 #3)
    val Seq(gx, gy) = Rank.gridsFor(per, Seq(col("x"), col("y")))
    val rx = Rank.rankExact(per, "__all", col("x"), col("o_custkey"),
      grid = gx, desc = false, out = "rx")
    val rxy = Rank.rankExact(rx, "__all", col("y"), col("o_custkey"),
      grid = gy, desc = false, out = "ry")
    // tie-group averages as CENSUS aggregates, not windows: partitionBy(x)
    // would run |x-domain| (~tens) tasks over ALL customers — the r9
    // q_rfm shape. The x census is tiny (order-count domain) → broadcast;
    // the y census is ~n rows (cents nearly unique) → shuffle hash join
    // on y, full parallelism, no per-partition sort.
    val tieX = rxy.groupBy(col("x"))
      .agg((min(col("rx")) + max(col("rx"))).as("ax2"))
    val tieY = rxy.groupBy(col("y"))
      .agg((min(col("ry")) + max(col("ry"))).as("ay2"))
    val ar = rxy.join(broadcast(tieX), Seq("x")).join(tieY, Seq("y"))
    val tot = ar.agg(count(lit(1)).as("n"))
    ar.crossJoin(broadcast(tot))
      .withColumn("cx", col("ax2") - (col("n") + 1L))
      .withColumn("cy", col("ay2") - (col("n") + 1L))
      .groupBy(col("n"))
      .agg(sum(col("cx") * col("cy")).as("sxy"),
           sum(col("cx") * col("cx")).as("sxx"),
           sum(col("cy") * col("cy")).as("syy"))
      .select(col("n"), col("sxy"),
        r6(col("sxy").cast("double") /
           (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))))
          .as("rho"))
  }

  /** q_runs_test: Wald–Wolfowitz runs test on each event_type's daily
    * up/down volume moves — "is the day-to-day direction random, or is
    * there momentum/mean-reversion": the nonparametric trend-structure
    * check that complements q_autocorr's linear form. Moves are the
    * SIGNS of consecutive daily-count diffs (zeros discarded, the
    * standard treatment); n₁/n₂/R (runs = 1 + sign changes) are exact
    * integers off two chained lag()s under ONE (event_type) partitioning
    * of the calendar-bounded daily census. z = (R − μ)/σ with
    * μ = 1 + 2n₁n₂/n, σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)) — one shared IEEE
    * tree, round-6; types with single-signed move sequences are excluded
    * (σ = 0 ⇒ NaN in any engine — refusing is the honest contract).
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val daily = Sources.events(spark, dir)
      .select(col("event_type"),
              datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("epoch_day"))
      .groupBy(col("event_type"), col("epoch_day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("epoch_day"))
    val moves = daily
      .withColumn("diff", col("cnt") - lag(col("cnt"), 1).over(w))
      .filter(col("diff").isNotNull && col("diff") =!= 0L)
      .withColumn("mv", when(col("diff") > 0L, 1).otherwise(-1))
    val agg = moves
      .withColumn("chg", when(lag(col("mv"), 1).over(w).isNotNull &&
                              lag(col("mv"), 1).over(w) =!= col("mv"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(sum(when(col("mv") === 1, 1L).otherwise(0L)).as("n1"),
           sum(when(col("mv") === -1, 1L).otherwise(0L)).as("n2"),
           (sum(col("chg")) + 1L).as("runs"))
      .filter(col("n1") > 0L && col("n2") > 0L)
    val nn = (col("n1") + col("n2")).cast("double")
    val p2 = lit(2.0) * (col("n1") * col("n2")).cast("double")
    agg.select(col("event_type"), col("n1"), col("n2"), col("runs"),
        r6((col("runs").cast("double") - (lit(1.0) + p2 / nn)) /
           sqrt(p2 * (p2 - nn) / (nn * nn * (nn - 1)))).as("z"))
      .orderBy(col("event_type"))
  }

  /** q_mannwhitney: Mann–Whitney U (Wilcoxon rank-sum) between the
    * BUILDING and MACHINERY segments' account balances — the
    * NONPARAMETRIC sibling of q_ttest over the same drift-monitoring
    * inputs as q_ks_test: "does one arm stochastically dominate", robust
    * to outliers a mean-based t would chase. Pooled global ranks come
    * from the same two-phase Rank.rankExact (no single-partition window);
    * tie groups collapse to average ranks (doubled → exact BIGINT), so
    * the doubled rank-sum 2R₁, 2U₁ = 2R₁ − n₁(n₁+1), and the tie
    * correction Σ(t³−t) are ALL exact integers. U surfaces as an exact
    * half-integer double; z uses the tie-corrected normal approximation
    * in one shared IEEE tree, round-6.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val two = Sources.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
              cents(col("c_acctbal")).as("v"))
      .withColumn("__all", lit(0))
      // consumed by the grid probe + rank census/join + tie census: without
      // this the 1-row percentile probe re-runs the customer scan+filter
      // on every execution (ADVICE r11 — the kruskalWallis pattern)
      .localCheckpoint()
    val rk = Rank.rankExact(two, "__all", col("v"), col("c_custkey"),
      grid = Rank.gridFor(two, col("v")), desc = false, out = "rk")
    // tie census + shuffle join on v (cents nearly unique → ~n tiny
    // groups): same rewrite as q_spearman's — no small-domain window
    val tieV = rk.groupBy(col("v"))
      .agg((min(col("rk")) + max(col("rk"))).as("ar2"))
    val ar = rk.join(tieV, Seq("v"))
    val m = ar.agg(
      count(when(col("seg") === "BUILDING", 1)).as("n1"),
      count(when(col("seg") === "MACHINERY", 1)).as("n2"),
      sum(when(col("seg") === "BUILDING", col("ar2"))).as("r1_2"))
    val tie = two.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val u2 = col("r1_2") - col("n1") * (col("n1") + 1L) // doubled U1, exact
    val nn = col("n1") + col("n2")
    m.crossJoin(broadcast(tie))
      .select(col("n1"), col("n2"),
        (u2.cast("double") / 2).as("u"),
        r6((u2 - col("n1") * col("n2")).cast("double") /
           (lit(2.0) * sqrt(col("n1").cast("double") * col("n2").cast("double") / 12.0 *
             ((nn + 1L).cast("double") -
              col("tsum").cast("double") /
                (nn.cast("double") * (nn - 1L).cast("double")))))).as("z"))
  }

  /** q_kruskal_wallis: Kruskal–Wallis H across ALL market segments'
    * account balances — the nonparametric omnibus that completes the
    * test matrix: q_anova is the >2-arm parametric omnibus, q_mannwhitney
    * the 2-arm rank test; this is the >2-arm rank test ("does ANY arm
    * stochastically dominate", robust where ANOVA's normality assumption
    * fails). Pooled global ranks come from the same two-phase
    * Rank.rankExact as q_mannwhitney (no single-partition window); tie
    * groups collapse to average ranks via the doubled-rank trick
    * (ar2 = min+max of the tie run — exact BIGINT), so each segment's
    * doubled rank sum ΣR_i·2 and the tie correction Σ(t³−t) are EXACT
    * integers pinning membership. H = 12/(N(N+1))·Σ R_i²/n_i − 3(N+1),
    * tie-corrected by C = 1 − Σ(t³−t)/(N³−N): each R_i²/n_i is one IEEE
    * expression of exactly-representable integers; the k-term cross-
    * segment sum is round-6-absorbed (the q_anova/q_entropy argument).
    * All-values-equal degenerates (C = 0) are refused by an exact
    * integer test. Scale: rank assignment is the grid-chunked two-phase
    * sort; everything after is segment-grain (5 rows).
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val v = Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
              cents(col("c_acctbal")).as("v"))
      .withColumn("__all", lit(0))
      .localCheckpoint(eager = false) // grid probe + rank census/local + tie census share ONE scan (lazy r12)
    val rk = Rank.rankExact(v, "__all", col("v"), col("c_custkey"),
      grid = Rank.gridFor(v, col("v")), desc = false, out = "rk")
    // doubled average rank per tie group: min+max of the run (exact, no
    // fractional halves until the final tree) — the q_mannwhitney rewrite
    val tieV = rk.groupBy(col("v"))
      .agg((min(col("rk")) + max(col("rk"))).as("ar2"))
    val g = rk.join(tieV, Seq("v"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("ar2")).as("r2"))
    val tie = v.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val m = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("r2").cast("double") * col("r2").cast("double") / 4.0 /
          col("n").cast("double")).as("rr"))
    val nD = col("nn").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) * col("rr") - lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("tsum").cast("double") /
      (col("nn") * col("nn") * col("nn") - col("nn")).cast("double")
    m.crossJoin(broadcast(tie))
      .filter(col("k") > 1 && col("nn") > col("k") &&
              col("tsum") < col("nn") * col("nn") * col("nn") - col("nn"))
      .select(col("k"), col("nn").as("n_total"), r6(h / corr).as("h"))
  }

  /** q_k_anonymity: k-anonymity audit over the quasi-identifier tuple
    * (nation, market segment, $1000 balance band) — the governance
    * check a dataset release runs BEFORE shipping: the CLASS-SIZE
    * HISTOGRAM (equivalence-class size → #classes, #rows) whose first
    * row IS k (the smallest class), and whose small-size mass is the
    * re-identification exposure. Pairs with q_pii_scrub: scrub removes
    * direct identifiers; this measures what the quasi-identifiers still
    * leak. Banding uses floor(cents/1e5) — floor, NOT integer div,
    * because balances go negative and Spark's `div` truncates toward
    * zero while DuckDB's `//` floors (a real cross-engine divergence on
    * negatives); the float boundary is exact (multiples of 1e5 divide
    * exactly). Two hash aggregates: QI-grain then size-grain — the
    * histogram is bounded by |distinct class sizes|. All integers.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.cents
    val cls = Sources.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(cents(col("c_acctbal")) / 100000.0).cast("long").as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("class_size"))
    cls.groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
           (col("class_size") * count(lit(1))).as("n_rows"))
      .orderBy(col("class_size"))
  }

  /** q_rate_shift: two-sample Poisson rate z-test per event_type across
    * the data-derived midpoint of the observation window — "did this
    * stream's arrival RATE change between the first and second half":
    * the volume-drift alarm that complements q_ks_test (value drift) and
    * q_error_spikes (daily outliers) with a single per-type verdict.
    * The split day mid = (min+max+1) div 2 comes from a 1-row global
    * bounds probe (broadcast — the q_rfm anchor-date shape); n₁/n₂ are
    * exact conditional counts, t₁/t₂ exact day spans, and
    * z = (n₁/t₁ − n₂/t₂)/√(n₁/t₁² + n₂/t₂²) is ONE shared IEEE tree of
    * exact integers, round-6. Empty types (n₁+n₂ = 0) cannot occur by
    * construction (a type exists because it has events); σ = 0 requires
    * n₁ = n₂ = 0, so no degenerate guard beyond the count is needed.
    * Scale: one map-side conditional aggregate at type grain.
    */
  def rateShift(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val d = Sources.events(spark, dir)
      .select(col("event_type"),
              datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"))
    val b = d.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("mn"), col("mx"), expr("(mn + mx + 1) div 2").as("mid"))
    val g = d.crossJoin(broadcast(b))
      .groupBy(col("event_type"))
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("n1"),
           sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("n2"),
           (first(col("mid")) - first(col("mn"))).as("t1"),
           (first(col("mx")) - first(col("mid")) + 1L).as("t2"))
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    val (t1, t2) = (col("t1").cast("double"), col("t2").cast("double"))
    g.filter(col("n1") + col("n2") > 0L && col("t1") > 0L && col("t2") > 0L)
      .select(col("event_type"), col("n1"), col("n2"), col("t1"), col("t2"),
        r6((n1 / t1 - n2 / t2) / sqrt(n1 / (t1 * t1) + n2 / (t2 * t2))).as("z"))
      .orderBy(col("event_type"))
  }

  /** q_hhi: Herfindahl–Hirschman concentration of supplier gross revenue
    * within each nation — the market-structure summary ("is this
    * nation's supply base competitive or captured") regulators and
    * marketplace teams compute per region/category; 1/HHI is the
    * effective number of suppliers. Gross revenue (Σ extendedprice) is
    * aggregated to supplier grain BEFORE any join — the
    * aggregate-then-join rule — so the nation lookup joins ~|suppliers|
    * rows, not lineitems, and the supplier dimension broadcasts. The
    * nation total S and per-supplier s_i are EXACT BIGINT cents; HHI =
    * Σs_i²/S² is computed with each s_i² as one IEEE product (s_i < 2⁵³
    * exact) summed in double — cross-supplier order absorbed by round-6
    * (BIGINT Σs_i² would overflow 2⁶³ near sf10; the double form never
    * does) — and top_share = max(s_i)/S is one IEEE division of exact
    * integers. Scale: one lineitem shuffle at supplier grain, then
    * nation-grain frames.
    */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.{cents, r6}
    val bySupp = Sources.lineitem(spark, dir)
      .select(col("l_suppkey"), cents(col("l_extendedprice")).as("c"))
      .groupBy(col("l_suppkey")).agg(sum(col("c")).as("s"))
    val dim = Sources.supplier(spark, dir)
      .join(Sources.nation(spark, dir),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name"))
    bySupp.join(broadcast(dim), Seq("l_suppkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
           sum(col("s")).as("total_cents"),
           sum(col("s").cast("double") * col("s").cast("double")).as("sq"),
           max(col("s")).as("smax"))
      .select(col("n_name"), col("n_suppliers"), col("total_cents"),
        r6(col("sq") /
           (col("total_cents").cast("double") * col("total_cents").cast("double"))).as("hhi"),
        r6(col("smax").cast("double") / col("total_cents").cast("double")).as("top_share"))
      .orderBy(col("n_name"))
  }
}
