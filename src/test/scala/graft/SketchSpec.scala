package graft

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketch

class SketchSpec extends AnyFunSuite with SparkFixture {

  /** Run the aggregator's own reduce/merge over explicit partitions —
    * exactly the combine tree Spark builds, but deterministic here.
    */
  private def sketchOf(parts: Seq[Seq[String]], k: Int): mutable.HashMap[String, Long] = {
    val agg = new Sketch.MisraGries(k)
    parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
  }

  test("misra-gries: merged partials keep every item above the n/(k+1) bound, estimates within bound") {
    val rnd = new Random(42)
    for (trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(12)
      // zipf-ish skew: item i drawn proportional to 1/(i+1)
      val items = Seq.fill(500 + rnd.nextInt(1500)) {
        var i = 0
        while (rnd.nextDouble() > 1.0 / (i + 2) && i < 40) i += 1
        s"w$i"
      }
      val n = items.size
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = items.grouped(n / (1 + rnd.nextInt(7)) + 1).toSeq
      val sk = sketchOf(parts, k)
      assert(sk.size <= k, s"trial $trial: ${sk.size} counters exceed capacity $k")
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (item, c) =>
        if (c > bound)
          assert(sk.contains(item), s"trial $trial: lost $item (count $c > bound $bound, n=$n, k=$k)")
      }
      sk.foreach { case (item, est) =>
        val c = exact(item)
        assert(est <= c && est >= c - bound,
          s"trial $trial: estimate $est for $item outside [${c - bound}, $c]")
      }
    }
  }

  test("misra-gries: merge order does not affect the superset guarantee") {
    val items = (0 until 300).map(i => s"x${i % 7}") ++ Seq.fill(50)("rare")
    val parts = items.grouped(40).toSeq
    val a = sketchOf(parts, 5)
    val b = sketchOf(parts.reverse, 5)
    // x0..x6 each appear ~43+ times of n=350, bound = 350/6 = 58.3 — only
    // guaranteed survivors are those above bound; but both orders must
    // agree on containing every item above it
    val n = items.size
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.filter(_._2 > n / 6.0).keys.foreach { item =>
      assert(a.contains(item) && b.contains(item))
    }
  }

  test("heavy hitters query: equals the exact HAVING form and counts are exact") {
    import org.apache.spark.sql.functions._
    val got = Sketch.heavyHittersQuery(spark, sfDir).collect()
    assert(got.nonEmpty)
    val exact = graft.io.Sources.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val want = exact.filter(col("cnt") * 200 >= n)
      .orderBy(desc("cnt"), col("tok")).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
           want.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
