package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pq

class PqSpec extends AnyFunSuite with SparkFixture {

  private def embeddings = graft.io.Sources
    .table(spark, sfDir, "embeddings")

  private def exactTopK(probe: Array[Double], k: Int): Seq[Long] = {
    val rows = embeddings.select("vec_id", "embedding").collect()
    rows.map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val d = v.zip(probe).map { case (a, b) => (a - b) * (a - b) }.sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSeq
  }

  private def probeVec(id: Long): Array[Double] =
    embeddings.filter(col("vec_id") === id)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray

  test("lossless regime: ksub >= corpus size makes ADC == exact distance") {
    // 20 vectors, 20 centroids per subspace -> every subvector is its own
    // centroid after one Lloyd round; quantization error is exactly zero
    val tiny = embeddings.filter(col("vec_id") < 20).localCheckpoint()
    val books = Pq.train(tiny, m = 8, ksub = 20, iters = 2)
    val coded = Pq.encode(tiny, books)
    val probe = probeVec(3)
    val adc = Pq.adcTopK(coded, books, probe, 20).collect()
    val exact = tiny.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      (r.getLong(0), v.zip(probe).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.toMap
    adc.foreach { r =>
      assert(math.abs(r.getDouble(1) - exact(r.getLong(0))) < 1e-9,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(1)} vs exact ${exact(r.getLong(0))}")
    }
    // self-probe is its own nearest neighbour at distance 0
    assert(adc.head.getLong(0) === 3L)
    assert(adc.head.getDouble(1) < 1e-12)
  }

  test("compression regime: recall@10 against exact top-10 clears the PQ floor") {
    val corpus = embeddings.localCheckpoint()
    val books = Pq.train(corpus, m = 8, ksub = 16, iters = 3)
    val coded = Pq.encode(corpus, books).localCheckpoint()
    val recalls = Seq(0L, 7L, 42L).map { pid =>
      val probe = probeVec(pid)
      val approx = Pq.adcTopK(coded, books, probe, 10).collect().map(_.getLong(0)).toSet
      val exact = exactTopK(probe, 10).toSet
      exact.intersect(approx).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    // 8 bytes per 64-dim vector is a 32x compression; on this synthetic
    // corpus mean recall@10 stays well above chance (10/N ~ 2%)
    assert(mean >= 0.3, s"mean recall@10 $mean below floor (per-probe: $recalls)")
    // the self vector always survives quantization as its own top hit
    val self = Pq.adcTopK(coded, books, probeVec(7), 10).collect().map(_.getLong(0))
    assert(self.contains(7L))
  }

  test("codes are bounded byte ids; encode is deterministic") {
    val corpus = embeddings.filter(col("vec_id") < 100).localCheckpoint()
    val books = Pq.train(corpus, m = 8, ksub = 16, iters = 1)
    val a = Pq.encode(corpus, books).select((0 until 8).map(j => col(s"pq_$j")): _*).collect()
    val b = Pq.encode(corpus, books).select((0 until 8).map(j => col(s"pq_$j")): _*).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach(r => (0 until 8).foreach { j =>
      val c = r.getInt(j)
      assert(c >= 0 && c < 16, s"code $c out of byte-codebook range")
    })
  }
}
