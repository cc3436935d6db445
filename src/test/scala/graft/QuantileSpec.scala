package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quantile

class QuantileSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  /** Rank error of an estimate vs the sorted truth: |true rank of the
    * estimated value − target rank| / n.
    */
  private def rankError(sorted: Array[Double], est: Double, q: Double): Double = {
    val below = sorted.count(_ <= est)
    math.abs(below.toDouble / sorted.length - q)
  }

  test("tdigest: rank error <= 1.5% on uniform, skewed and clustered data; exact extremes") {
    val n = 20000
    val rnd = new scala.util.Random(42)
    val datasets = Map(
      "uniform" -> Array.fill(n)(rnd.nextDouble() * 1000),
      "lognormal" -> Array.fill(n)(math.exp(rnd.nextGaussian() * 2)),
      "clustered" -> Array.fill(n)(math.floor(rnd.nextDouble() * 10) * 100 + rnd.nextGaussian()))
    val agg = Quantile.tdigest(100)
    datasets.foreach { case (name, data) =>
      val ds = spark.createDataset(data.toSeq).repartition(8)
      val qs = ds.select(udaf(agg).apply(col("value"))).as[Seq[Double]].collect()(0)
      val sorted = data.sorted
      agg.probs.zip(qs).foreach { case (p, est) =>
        if (p == 0.0) assert(est === sorted.head, s"$name min")
        else if (p == 1.0) assert(est === sorted.last, s"$name max")
        else {
          val err = rankError(sorted, est, p)
          assert(err <= 0.015, s"$name q=$p est=$est rank error $err")
        }
      }
    }
  }

  test("tdigest: partial-aggregate merge tree equals a driver-side single digest within tolerance") {
    val n = 10000
    val rnd = new scala.util.Random(7)
    val data = Array.fill(n)(rnd.nextGaussian() * 50 + 200)
    // 16 partitions forces a real merge tree through partial aggregation
    val dist = spark.createDataset(data.toSeq).repartition(16)
      .select(udaf(Quantile.tdigest(100)).apply(col("value"))).as[Seq[Double]].collect()(0)
    val agg = Quantile.tdigest(100)
    val single = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    val sorted = data.sorted
    agg.probs.zip(dist).zip(single).foreach { case ((p, d), s) =>
      // both paths must honor the rank-error contract — merging cannot
      // degrade the digest beyond the bound
      if (p > 0 && p < 1) {
        assert(rankError(sorted, d, p) <= 0.015, s"distributed q=$p")
        assert(rankError(sorted, s, p) <= 0.015, s"single-pass q=$p")
      }
    }
  }

  test("tdigest: per-group aggregation; digest size stays bounded") {
    val df = graft.io.Sources.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(Quantile.tdigestColumn(col("c_acctbal")).as("qs"))
    val rows = df.collect()
    assert(rows.length >= 3)
    // per-group median within tolerance of the exact percentile
    val exact = graft.io.Sources.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(expr("percentile(c_acctbal, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val med = r.getSeq[Double](1)(3) // probs index 3 = 0.5
      val cnt = graft.io.Sources.customer(spark, sfDir)
        .filter(col("c_mktsegment") === r.getString(0)).count()
      // tiny groups are near-exact; allow value slack proportional to spread
      assert(math.abs(med - exact(r.getString(0))) <= 2000.0 / math.sqrt(cnt.toDouble) + 50,
        s"${r.getString(0)}: median $med vs exact ${exact(r.getString(0))}")
    }
    // centroid count bounded: buffer after full fold stays O(delta)
    val agg = Quantile.tdigest(100)
    val big = (1 to 100000).map(_.toDouble)
    val buf = agg.finish(big.foldLeft(agg.zero)(agg.reduce))
    assert(buf.length === agg.probs.length)
    val folded = big.foldLeft(agg.zero)(agg.reduce)
    // k1 merging rule: <= ~2*delta centroids regardless of input count
    assert(folded.means.length <= 2 * 100 + 10,
      s"digest grew unbounded: ${folded.means.length} centroids")
    assert(folded.buf.length < 4 * 100)
  }

  test("tdigest: empty input yields NaN quantiles; single value collapses") {
    val agg = Quantile.tdigest(100)
    assert(agg.finish(agg.zero).forall(_.isNaN))
    val one = agg.finish(agg.reduce(agg.zero, 42.0))
    assert(one.forall(_ === 42.0))
  }

  test("merge of compressed partials (empty buffers) preserves the sorted-means invariant") {
    // row counts an exact multiple of 4*delta leave partials with EMPTY
    // buffers; merge concatenates two sorted centroid runs — without a
    // sortedness check the early return would feed quantiles() a
    // non-monotone means array (regression: found by review)
    val agg = Quantile.tdigest(100)
    val lo = (1 to 400).map(_.toDouble)              // exactly 4*delta
    val hi = (10001 to 10400).map(_.toDouble)
    val bLo = lo.foldLeft(agg.zero)(agg.reduce)
    val bHi = hi.foldLeft(agg.zero)(agg.reduce)
    assert(bLo.buf.isEmpty && bHi.buf.isEmpty, "precondition: compressed partials")
    // merge hi-first so the concatenated means are clearly out of order
    val merged = agg.merge(bHi, bLo)
    val qs = agg.finish(merged)
    val sorted = (lo ++ hi).sorted
    agg.probs.zip(qs).foreach { case (p, est) =>
      if (p > 0 && p < 1) {
        val below = sorted.count(_ <= est)
        assert(math.abs(below.toDouble / sorted.length - p) <= 0.02,
          s"q=$p est=$est after empty-buffer merge")
      }
    }
    assert(qs.head === 1.0 && qs.last === 10400.0)
  }

  test("exact regime (delta > pi*n/2): all singletons; median == percentile_cont exactly") {
    // adversarial mass: heavy duplicates + clustered values — the shapes
    // that blend centroids in the approximate regime
    for (n <- Seq(7, 8, 101, 200)) {
      val xs = (0 until n).map(i => if (i % 3 == 0) 42.0 else (i * 37 % 23) * 1000.0 + i)
      val delta = (math.Pi / 2.0 * n).toInt + 2
      val agg = Quantile.tdigest(delta)
      var b = agg.zero
      xs.foreach(x => b = agg.reduce(b, x))
      // force the final compress the aggregation path runs via finish
      val med = agg.finish(b)(3) // probs index of q=0.5
      val sorted = xs.sorted
      val want =
        if (n % 2 == 1) sorted(n / 2)
        else sorted(n / 2 - 1) + 0.5 * (sorted(n / 2) - sorted(n / 2 - 1))
      assert(med === want, s"n=$n")
      // the regime really is all-singleton: compress kept every point
      val compressed = agg.merge(b, agg.zero) // merge() compresses
      assert(compressed.means.length === n, s"n=$n centroids=${compressed.means.length}")
    }
  }
}
