package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression gate over EVERY declared query (SURVEY §4 / the 100 TB
  * mandate, promoted from the dev-only PlanAudit tool): a query whose
  * physical plan degrades to a cartesian/nested-loop shape, or whose
  * lineitem scan stops pruning columns, fails `sbt test` — catching the
  * scale regressions (like the former all-pairs q_sim_neardup and the
  * user_id-only interval join) automatically instead of at judge time.
  */
class PlanGateSpec extends AnyFunSuite with SparkFixture {

  /** Queries where a nested-loop join is the INTENDED plan: a provably
    * tiny broadcast side (a 1-row probe, a 10-row probe set, the 5×25
    * region×nation cross). Everything else must hash/sort-merge join.
    */
  private val nestedLoopAllowed = Set(
    "q_join_cross",      // region × nation: 5 × 25 rows, both dimension tables
    "q_sim_cosine_topk", // corpus × broadcast(1-row probe)
    "q_knn_majority",    // candidates × broadcast(10-row probe set)
    "q_bm25",            // term hits × broadcast(1-row corpus stats (N, Σdl))
    "q_event_bigrams",   // transition counts × broadcast(1-row grand total)
    "q_fuzzy_match",     // master table × broadcast(8-row probe list)
    "q_cluster_assign",  // corpus × broadcast(k-row centroid frame)
    "q_ivf_probe",       // corpus/probes × broadcast(8-row fixed centroid frame)
    "q_ann_recall",      // q_ivf_probe's crosses + corpus × broadcast(10-row probes)
    "q_kmeans",          // corpus × broadcast(k-row centroids), both rounds
    "q_triangle_count",  // final 1-row (nodes × edges × triangles) profile join
    "q_token_pmi",       // count table × broadcast(1-row N and M totals)
    "q_chisq",           // contingency cells × broadcast(1-row totals)
    "q_cramers_v",       // contingency cells × broadcast(1-row totals)
    "q_ks_test",         // cumulative counts × broadcast(1-row n1/n2 totals)
    "q_market_basket",   // pair counts × broadcast(1-row order total)
    "q_locf_gapfill",    // distinct users × broadcast(30-row generated date spine)
    "q_interp_gapfill",  // the same users × 30-row generated spine cross join
    "q_benford",         // 9 digit rows × broadcast(1-row total)
    "q_freshness",       // 5 stream rows × broadcast(1-row global max)
    "q_rfm",             // per-customer aggregate × broadcast(1-row anchor date)
    "q_rate_shift",      // events × broadcast(1-row window-bounds probe)
    "q_time_to_convert", // ranked deltas × broadcast(1-row count/min/max)
    "q_pq_adc",          // 16 base vectors × broadcast(50-row replica range)
    "q_ivf_pq",          // q_pq_adc's replica cross + corpus/probe × broadcast(4-row centroid frame)
    "q_percent_total",   // 5 segment rows × broadcast(1-row grand total)
    "q_error_spikes",    // 30 day rows × broadcast(1-row totals)
    "q_vocab_growth",    // token first-doc table × broadcast(1-row max + 10-row deciles)
    "q_spearman",        // ranked frame × broadcast(1-row n total)
    "q_mannwhitney",     // 1-row moments × broadcast(1-row tie correction)
    "q_kruskal_wallis",  // 1-row moments × broadcast(1-row tie correction)
    "q_growth_accounting", // churn-week frame × broadcast(1-row max week)
    "q_l28_histogram",   // (user, day) census × broadcast(1-row min day)
    "q_cusum",           // daily census × broadcast(1-row n/T totals)
    "q_tfidf_topterms"   // (lang, term) tf×df frame × broadcast(1-row corpus N)
  )

  /** A lineitem ReadSchema carrying join keys AND money AND date columns
    * together means column pruning failed — no declared query legitimately
    * needs that combination in one scan.
    */
  private def unprunedLineitem(p: String): Boolean =
    p.linesIterator.exists(l => l.contains("ReadSchema") &&
      Seq("l_partkey", "l_suppkey", "l_tax", "l_shipdate").forall(l.contains))

  test("no CartesianProduct or BroadcastNestedLoopJoin outside the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = plan(fn(spark, sfDir))
      val bad =
        (if (p.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (p.contains("BroadcastNestedLoopJoin")) Seq("BroadcastNestedLoopJoin") else Nil)
      if (bad.nonEmpty && !nestedLoopAllowed(name)) Some(s"$name: ${bad.mkString(",")}")
      else None
    }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans outside the allowlist:\n  ${offenders.mkString("\n  ")}")
  }

  test("allowlisted nested-loop queries still exist (stale allowlist check)") {
    nestedLoopAllowed.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"allowlist names unknown query $name")
    }
  }

  test("q_partition_prune: month predicate lands in PartitionFilters (directory skip)") {
    val p = plan(ops.Etl.partitionPrune(spark, sfDir))
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_month"),
      s"month predicate not in PartitionFilters — pruning lost:\n$p")
    // the predicate must NOT fall through to data-level PushedFilters:
    // partition pruning skips directories at planning time, a pushed filter
    // still opens every file
    assert(!scanLine.replaceAll(".*PushedFilters", "").contains("o_month"),
      s"o_month degraded to a data filter:\n$scanLine")
  }

  test("dynamic partition pruning fires on a dim-filtered join against the partitioned fact") {
    val path = ops.Etl.partitionedOrdersPath(spark, sfDir)
    val fact = spark.read.parquet(path)
    // month dimension with a derived attribute; the selective filter is on
    // the DIM side only — the fact's partition pruning must come from DPP
    val dim = fact.select(org.apache.spark.sql.functions.col("o_month")).distinct()
      .withColumn("q1", org.apache.spark.sql.functions.col("o_month").substr(6, 2)
        .isin("01", "02", "03"))
    val joined = fact
      .join(org.apache.spark.sql.functions.broadcast(
        dim.filter(org.apache.spark.sql.functions.col("q1"))), Seq("o_month"))
      .groupBy("o_month")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val p = plan(joined)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan — DPP not planned:\n$p")
  }

  test("q_partition_dpp: the DECLARED key plans a dynamicpruning subquery") {
    val p = plan(ops.Etl.partitionDpp(spark, sfDir))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"declared DPP key lost its runtime pruning subquery:\n$p")
  }

  test("q_bucket_join: co-located bucketed join plans NO shuffle Exchange") {
    val p = plan(ops.Scale.bucketJoinQuery(spark, sfDir))
    // the join itself must zip buckets: no hashpartitioning Exchange may
    // feed the SortMergeJoin (the aggregate after it may shuffle — that's
    // the groupBy's own exchange, keyed on c_mktsegment, not the join's)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(p.contains("SortMergeJoin"), s"bucketed join must SMJ:\n$p")
    assert(!exchanges.exists(_.contains("custkey")),
      s"join-key shuffle under the bucketed join — bucket co-location lost:\n$p")
  }

  test("q_partition_catalog: 5-day range plans only the in-range day groups") {
    val df = ops.Etl.partitionCatalog(spark, sfDir)
    assert(df.count() > 0) // builds the table on first call
    // the events span 30 day-partitions; the declared 5-day range must
    // plan exactly the 5 in-range groups (manifest-stat pruning, made
    // exact by per-day routing). Probe the scan WITHOUT the aggregate so
    // AQE doesn't wrap the plan: one RDD partition per planned group.
    import org.apache.spark.sql.functions.{col, lit}
    val probe = spark.table("graft_ev.default.events_by_day")
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp_ntz") &&
              col("ts") < lit("2024-01-15").cast("timestamp_ntz"))
    assert(probe.rdd.getNumPartitions === 5,
      s"expected 5 in-range day groups planned out of ~30, got ${probe.rdd.getNumPartitions}")
  }

  test("q_join_asof_bucketed: as-of window runs on storage partitioning — no hash Exchange") {
    val df = ops.Streaming.asofBucketedCatalog(spark, sfDir)
    val p = plan(df)
    assert(p.contains("Window"), s"as-of must plan a Window:\n$p")
    // the per-user window must be fed by the catalog scan's
    // KeyGroupedPartitioning (bucket(8, user_id)) — a hashpartitioning
    // Exchange under the Window means the storage layout was lost. The
    // only legal shuffle is the final presentation sort (rangepartitioning
    // on event_id).
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.isEmpty,
      s"hash Exchange under the bucketed as-of window — storage partitioning lost:\n$p")
    // and the result is non-trivial (clicks with a prior signup exist)
    assert(df.limit(1).count() === 1)
  }

  test("runtime bloom filter: selective dim filter injects might_contain into the fact scan side") {
    import org.apache.spark.sql.functions._
    // At 100 TB the runtime bloom filter is the row-level sibling of DPP:
    // a selective dimension filter becomes a bloom probe on the fact's
    // join key BEFORE the shuffle, cutting shuffled bytes by the dim's
    // selectivity. Local thresholds are tuned so the optimizer exercises
    // the same rule it would at scale (the app-side scan threshold is
    // 10 GB by default — far above test data).
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val o = graft.io.Sources.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val l = graft.io.Sources.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"))
      val p = plan(j)
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected on the probe side:\n$p")
      assert(j.collect()(0).getLong(0) > 0)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** Queries with a DOCUMENTED bounded-but-global window: the window input
    * is capped by construction (a distinct-value domain or a tiny curve),
    * per VERDICT r8 "watch items". Every entry must carry its bound.
    */
  private val boundedGlobalWindowAllowed = Set(
    "q_ks_test",   // cumulative counts over distinct balance cents (bounded domain, documented fallback)
    "q_skyline",   // distinct price cents domain
    "q_survival",  // ~30-row Kaplan-Meier curve
    "q_mixture_weights", // T* min over the per-LANGUAGE aggregate (<= |langs| rows)
    "q_mixture_sample",  // reuses the q_mixture_weights rate frame
    "q_cumulative_uniques", // running sum over the DAILY aggregate (calendar-days domain)
    "q_skew_diag",          // cumulative over the rows-per-key VALUE HISTOGRAM (tens of rows)
    "q_burn_rate",          // 7-row frame over the GLOBAL daily census (calendar-days domain)
    "q_cusum",              // prefix sum + prefix min over the GLOBAL daily census (calendar-days domain)
    // GLOBAL two-phase ranks (seg = a constant column, which Catalyst
    // folds out of the partition spec): the flagged window is rankExact's
    // census prefix-sum, whose input is the (seg, chunk) census —
    // ≤ |chunk grid| rows by construction (tens-to-hundreds at any SF)
    "q_spearman",   // census grids: order-count step=1 (~tens), spend step=2e7 (~hundreds)
    "q_mannwhitney", // census grid: balance cents step=1e4 (~110 chunks)
    "q_kruskal_wallis", // same pooled-rank census grid as q_mannwhitney (~256 chunks)
    "q_score_deciles",  // ntileExact census grid over quality (equi-depth, ~256 chunks)
    "q_time_to_convert" // rankExact census grid over converter seconds (~256 chunks)
  )

  test("no partition-less WindowExec over unbounded input in any declared plan") {
    // the round-8 q_zipf_slope lesson: a Window with no partitionSpec moves
    // EVERYTHING to one task. Legal only when the window's input is already
    // bounded — fed by a GlobalLimit/TakeOrderedAndProject — or allowlisted
    // with a documented bound above.
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        if (boundedGlobalWindowAllowed(name)) None
        else {
          val phys = strip(fn(spark, sfDir).queryExecution.executedPlan)
          val bad = phys.collect {
            case w: WindowExec if w.partitionSpec.isEmpty &&
              !w.exists { case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
                          case _ => false } => w
          }
          if (bad.nonEmpty) Some(name) else None
        }
      }
      assert(offenders.isEmpty,
        s"partition-less Window over unbounded input in:\n  ${offenders.mkString("\n  ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("bounded-global-window allowlist is not stale") {
    boundedGlobalWindowAllowed.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"allowlist names unknown query $name")
    }
  }

  /** Column names whose value domain is a CONSTANT regardless of scale
    * factor (TPC-H enumerations / fixture categoricals). A ranking window
    * partitioned ONLY by these runs on |domain| tasks at any scale — the
    * r9-verdict q_rfm/q_quantile_bands shape (each window task sorts N/5
    * rows at 100 TB). Legal only when the window's INPUT is a bounded
    * aggregate (a census over constant domains / calendar days), recorded
    * in the allowlist below with its bound.
    */
  private val constantDomainCols = Set(
    "c_mktsegment", "seg", "o_orderpriority", "o_orderstatus",
    "l_returnflag", "l_linestatus", "event_type", "lang", "mktsegment")

  /** Ranking windows partitioned by a constant-domain key whose input is
    * bounded BY CONSTRUCTION — every entry carries its bound.
    */
  private val boundedSegRankWindowAllowed = Map(
    "q_window_ntile" -> "§2F ranking-construct demo; doc-commented scale note",
    "q_window_rank" -> "§2F ranking-construct demo; doc-commented scale note",
    "q_mode" -> "window input = (status × priority) census, ≤ 15 rows",
    "q_changepoint" -> "window input = daily census per event_type, ≤ days × types rows",
    "q_theil_sen" -> "window input = census pair set, ≤ C(days,2) × types rows",
    // Rank.topK keys: the FINAL per-group rank window runs over the local
    // pre-rank's survivors — ≤ k × input-partitions rows per group by
    // construction (the two-phase top-k; phase 1 is chunk-partitioned)
    "q_lm_score" -> "final window input = Rank.topK survivors, ≤ 10·P per lang",
    "q_tfidf_topterms" -> "final window input = Rank.topK survivors, ≤ 5·P per lang",
    "q_topk_per_group" -> "final window input = Rank.topK survivors, ≤ 3·P per segment",
    "q_stratified_sample" -> "final window input = Rank.topK survivors, ≤ 10·P per lang"
  )

  test("no constant-domain-partitioned ranking window over unbounded input") {
    // q_rfm/q_quantile_bands lesson (VERDICT r9 #1/#2): ntile/row_number
    // PARTITION BY a 5-value column moves everything through 5 tasks.
    // Rank.ntileExact is the sanctioned rewrite; windows like it must
    // either ride a bounded census (allowlist, with the bound documented)
    // or carry a high-cardinality column in the partition spec.
    import org.apache.spark.sql.catalyst.expressions.{CumeDist, DenseRank, NTile, PercentRank, Rank => CRank, RowNumber, WindowExpression}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def isRanking(w: WindowExec): Boolean = w.windowExpression.exists(_.exists {
      case WindowExpression(_: NTile | _: RowNumber | _: CRank | _: DenseRank |
                            _: PercentRank | _: CumeDist, _) => true
      case _ => false
    })
    def constantDomainOnly(w: WindowExec): Boolean =
      w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.references.forall(a =>
        constantDomainCols(a.name.toLowerCase)))
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        if (boundedSegRankWindowAllowed.contains(name)) None
        else {
          val phys = strip(fn(spark, sfDir).queryExecution.executedPlan)
          val bad = phys.collect {
            case w: WindowExec if isRanking(w) && constantDomainOnly(w) => w
          }
          if (bad.nonEmpty) Some(name) else None
        }
      }
      assert(offenders.isEmpty,
        s"constant-domain ranking window (the q_rfm r9 anti-pattern) in:\n  ${offenders.mkString("\n  ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("constant-domain ranking-window allowlist is not stale") {
    boundedSegRankWindowAllowed.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"allowlist names unknown query $name")
    }
  }

  test("every lineitem scan prunes its ReadSchema") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (unprunedLineitem(plan(fn(spark, sfDir)))) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpruned lineitem ReadSchema in:\n  ${offenders.mkString("\n  ")}")
  }
}
