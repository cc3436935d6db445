package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch — the approximate-percentile primitive for
  * 100 TB aggregation, as a typed Aggregator (the UDAF surface, SURVEY
  * §2 J). Exact percentiles (q_agg_percentile / percentile()) sort or
  * histogram the full value set per group; at corpus scale the right
  * tool is a bounded-size MERGEABLE summary whose partials combine in
  * Spark's partial-aggregate tree exactly like a sum.
  *
  * This is the MERGING t-digest (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests", 2019 — public arXiv/software
  * design, implemented from the paper's merging formulation, no code
  * shared): centroids (mean, weight) kept sorted by mean; a buffer of
  * raw points is folded in by a single sorted merge pass that greedily
  * grows clusters while the k1 scale function allows — cluster capacity
  * ∝ q(1−q), so tails stay near-exact (weight-1 centroids) while the
  * middle compresses. Size is O(δ) regardless of input count.
  *
  * Accuracy contract (tolerance-tested in QuantileSpec — approximate
  * regimes cannot hash-match): rank error ≤ ~1%·n at δ=100 on every
  * tested distribution, exact at the extremes (q=0/1 return true
  * min/max, tracked explicitly).
  *
  * The APPROXIMATE regime stays outside the DuckDB gate by the §2.1
  * determinism rules (the approx_count_distinct ruling); the EXACT
  * regime (δ past the all-singleton threshold — see tdigestExactQuery)
  * IS gated as `q_tdigest_exact`, the same deterministic-regime pattern
  * that gates PQ via q_pq_adc and IVF via q_ivf_probe.
  */
object Quantile {

  /** Digest state: parallel mean/weight arrays sorted by mean, plus an
    * unmerged raw-point buffer (flushed when it reaches 4δ) and exact
    * min/max. A case class of Seqs keeps the buffer inside stock product
    * encoders — no Kryo, no UDT.
    */
  case class TDigestBuf(
      means: Seq[Double], weights: Seq[Double],
      buf: Seq[Double],
      min: Double, max: Double, count: Long)

  class TDigest(delta: Int = 100)
      extends Aggregator[Double, TDigestBuf, Seq[Double]] {

    /** Quantiles reported by finish — fixed so the output is a plain
      * Seq[Double] under stock encoders.
      */
    val probs: Seq[Double] = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)

    def zero: TDigestBuf =
      TDigestBuf(Nil, Nil, Nil, Double.PositiveInfinity, Double.NegativeInfinity, 0L)

    def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
      val nb = b.copy(buf = x +: b.buf,
        min = math.min(b.min, x), max = math.max(b.max, x), count = b.count + 1)
      if (nb.buf.length >= 4 * delta) compress(nb) else nb
    }

    def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf =
      compress(TDigestBuf(
        means = a.means ++ b.means, weights = a.weights ++ b.weights,
        buf = a.buf ++ b.buf,
        min = math.min(a.min, b.min), max = math.max(a.max, b.max),
        count = a.count + b.count))

    /** One sorted merge pass: fold buffered points (weight 1) and
      * existing centroids together in mean order, growing the current
      * cluster while the k1 scale function allows — absorb while
      * k(q_after) − k(q_start) ≤ 1 with k(q) = δ/(2π)·asin(2q−1) (the
      * paper's merging rule). k's slope diverges at the tails, so extreme
      * centroids stay singletons (near-exact tail quantiles), and k spans
      * exactly δ k-units over [0,1], so the pass emits ≤ ~2δ centroids
      * REGARDLESS of input count — strict O(δ) state.
      */
    private def compress(b: TDigestBuf): TDigestBuf = {
      // the early return must ALSO verify the sorted-by-mean invariant:
      // merge() concatenates two sorted centroid runs, and a merged
      // state whose partials had empty buffers (row counts an exact
      // multiple of 4*delta) would otherwise skip the re-sort and feed
      // quantiles() a non-monotone means array
      def sorted: Boolean = {
        var i = 1
        while (i < b.means.length) {
          if (b.means(i - 1) > b.means(i)) return false
          i += 1
        }
        true
      }
      if (b.buf.isEmpty && b.means.length <= 2 * delta && sorted) return b
      val pts = ((b.means zip b.weights) ++ b.buf.map((_, 1.0)))
        .sortBy(_._1)
      if (pts.isEmpty) return b.copy(buf = Nil)
      val w = pts.map(_._2).sum
      val z = delta / (2.0 * math.Pi)
      def k(q: Double): Double = z * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
      val outM = scala.collection.mutable.ArrayBuffer[Double]()
      val outW = scala.collection.mutable.ArrayBuffer[Double]()
      var cm = pts.head._1 * pts.head._2
      var cw = pts.head._2
      var done = 0.0     // weight fully emitted so far
      var kStart = k(0.0)
      pts.tail.foreach { case (m, pw) =>
        val qAfter = (done + cw + pw) / w
        if (k(qAfter) - kStart <= 1.0) { cm += m * pw; cw += pw }
        else {
          outM += cm / cw; outW += cw; done += cw
          kStart = k(done / w)
          cm = m * pw; cw = pw
        }
      }
      outM += cm / cw; outW += cw
      TDigestBuf(outM.toSeq, outW.toSeq, Nil, b.min, b.max, b.count)
    }

    /** Interpolated quantiles: each centroid's mass is centered at its
      * cumulative midpoint; linear interpolation between midpoints, with
      * the tracked min/max anchoring the extremes.
      */
    def quantiles(b0: TDigestBuf, qs: Seq[Double]): Seq[Double] = {
      val b = compress(b0)
      if (b.count == 0) return qs.map(_ => Double.NaN)
      val w = b.weights.sum
      // cumulative midpoints
      val mids = new Array[Double](b.means.length)
      var acc = 0.0
      var i = 0
      while (i < b.means.length) {
        mids(i) = acc + b.weights(i) / 2.0
        acc += b.weights(i)
        i += 1
      }
      qs.map { q =>
        if (q <= 0.0) b.min
        else if (q >= 1.0) b.max
        else {
          val target = q * w
          if (target <= mids.head) {
            // below the first midpoint: interpolate from the true min
            val t = target / mids.head
            b.min + t * (b.means.head - b.min)
          } else if (target >= mids.last) {
            val t = (target - mids.last) / (w - mids.last)
            b.means.last + t * (b.max - b.means.last)
          } else {
            val j = mids.indexWhere(_ >= target)
            val t = (target - mids(j - 1)) / (mids(j) - mids(j - 1))
            b.means(j - 1) + t * (b.means(j) - b.means(j - 1))
          }
        }
      }
    }

    def finish(b: TDigestBuf): Seq[Double] = quantiles(b, probs)

    def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** The digest as an untyped aggregating Column usable in
    * DataFrame.agg — `Quantile.tdigest(delta).toColumn` needs a typed
    * Dataset; this wrapper goes through the UDAF registration path.
    */
  def tdigest(delta: Int = 100): TDigest = new TDigest(delta)

  /** Convenience: per-group approximate quantiles of `valueCol` via the
    * registered UDAF column (functions.udaf keeps the Aggregator inside
    * Spark's partial-aggregation tree — the sketch merges map-side).
    */
  def tdigestColumn(valueCol: Column, delta: Int = 100): Column =
    org.apache.spark.sql.functions.udaf(new TDigest(delta)).apply(valueCol)

  /** q_tdigest_exact: the t-digest's EXACT REGIME under the oracle gate
    * (VERDICT r10 #4 — the q_pq_adc/q_ivf_probe "deterministic regime"
    * pattern, completing §J): per-language min/median/max document
    * length computed BY THE DIGEST — the same Aggregator, reduce/merge
    * tree, and interpolation code the approximate regime runs — with δ
    * probed past the all-singleton threshold, hash-compared to DuckDB's
    * min/median/max.
    *
    * Why this is provably exact, not just empirically close: the k1
    * merge rule absorbs a neighbor only while k(q_after) − k(q_start) ≤
    * 1, and k's slope is ≥ 2·δ/2π everywhere, so two weight-1 points
    * always gain > (2/n)·(δ/π) k-units — strictly > 1 whenever
    * δ > πn/2. Past that threshold EVERY point stays its own centroid:
    * means are raw values (no blending), the weight sum is an exact
    * integer-valued double, midpoints are exact halves, and the q=0.5
    * midpoint interpolation lands on the middle order statistic (odd n)
    * or the exact average of the two middles (even n) — precisely
    * percentile_cont(0.5)'s answer, in identical IEEE arithmetic. q=0/1
    * return the tracked true min/max. The probs grid's other entries
    * use a different rank convention than percentile_cont and are NOT
    * declared (tolerance-tested in QuantileSpec like every approximate
    * regime).
    *
    * δ comes from a 1-row probe of the largest group (the Rank.gridFor
    * idiom — no hard-coded domain constant). The exact regime holds all
    * points by design — the bounded-ground-truth convention of the
    * q_dedup_* twins; production keeps δ≈100 where the digest is O(δ)
    * and ~1%-rank-accurate.
    */
  def tdigestExactQuery(spark: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.io.Sources.documents(spark, dir)
      .select(col("lang"), length(col("text")).cast("double").as("len"))
    val nMax = docs.groupBy(col("lang")).count().agg(max("count")).head().getLong(0)
    val delta = (math.Pi / 2.0 * nMax.toDouble).toInt + 2
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           tdigestColumn(col("len"), delta).as("qs"))
      .select(col("lang"), col("n_docs"),
        element_at(col("qs"), 1).as("len_min"),
        element_at(col("qs"), 4).as("len_med"),
        element_at(col("qs"), 7).as("len_max"))
      .orderBy(col("lang"))
  }
}
