package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Frequency sketches — the "what are the heavy hitters" primitive a
  * corpus-scale engine needs where exact `GROUP BY token` is hostile: at
  * 100 TB the vocabulary (URLs, hosts, shingles, tokens) can be billions
  * of distinct groups, so even partial aggregation shuffles a huge key
  * space just to answer "which few items dominate".
  *
  * The shape here is the classic two-pass exact heavy hitters:
  *
  *   pass 1  Misra–Gries sketch (capacity k): one scan, each task keeps at
  *           most k counters; partials MERGE losslessly w.r.t. the error
  *           bound (Agarwal et al., "Mergeable Summaries", PODS 2012), so
  *           the combine tree is exactly a Spark partial aggregate. The
  *           result is ≤ k candidate items, GUARANTEED to include every
  *           item with true count > n/(k+1).
  *   pass 2  re-scan with a driver-held ≤k-item filter (the IVF-centroid
  *           pattern: O(k) driver state, never row data) and count ONLY
  *           candidates exactly — the shuffle carries ≤ k groups instead
  *           of the vocabulary.
  *
  * With threshold expressed as a FRACTION φ of total occurrences and
  * k + 1 > 1/φ, pass 1 provably loses no qualifying item, so the two-pass
  * result equals the exact `HAVING count ≥ φ·n` answer — which is why
  * q_heavy_hitters can sit under the DuckDB oracle gate even though a
  * sketch is involved.
  */
object Sketch {

  /** Misra–Gries frequent-items sketch as a typed Aggregator (the UDAF
    * surface, SURVEY §2 J): input = item, buffer = at most k counters.
    *
    * reduce: increment a present counter, else insert if room, else
    * decrement ALL counters and drop zeros (each such decrement retires
    * k+1 occurrences — the classic amortized argument giving error
    * ≤ n/(k+1) per item).
    *
    * merge: pointwise-sum both maps; if more than k counters survive,
    * subtract the (k+1)-th largest count from every counter and drop the
    * non-positives — the mergeable-summaries rule that PRESERVES the
    * per-item error bound across Spark's partial-aggregate tree.
    *
    * finish returns the candidate items joined with ' ' (items here are
    * space-split tokens, so the separator cannot occur inside one); a
    * plain String output keeps the whole aggregation inside stock
    * encoders — the estimates are deliberately dropped because the exact
    * pass-2 recount supersedes them.
    */
  class MisraGries(k: Int) extends Aggregator[String, mutable.HashMap[String, Long], String] {
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
      b.get(a) match {
        case Some(c) => b.update(a, c + 1)
        case None if b.size < k => b.update(a, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          b.foreach { case (item, c) => if (c == 1L) dead += item else b.update(item, c - 1) }
          dead.foreach(b.remove)
      }
      b
    }

    def merge(x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      y.foreach { case (item, c) => x.update(item, x.getOrElse(item, 0L) + c) }
      if (x.size > k) {
        // subtract the (k+1)-th largest count from everything, drop <= 0
        val m = x.values.toArray.sortWith(_ > _).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        x.foreach { case (item, c) => if (c - m <= 0L) dead += item else x.update(item, c - m) }
        dead.foreach(x.remove)
      }
      x
    }

    def finish(b: mutable.HashMap[String, Long]): String =
      b.keysIterator.toArray.sorted.mkString(" ")

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.javaSerialization[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** q_heavy_hitters: tokens with relative frequency ≥ 1/200 of all
    * non-empty tokens in the corpus, with their EXACT counts.
    *
    * Declared-exact despite the sketch: capacity 255 gives per-item error
    * ≤ n/256 < n/200, so pass 1 cannot lose a qualifying token; pass 2
    * recounts candidates exactly and applies the threshold as INTEGER
    * arithmetic (200·cnt ≥ n — no float boundary). The 1-row sketch
    * result is collected (≤255 tokens + one Long — driver state bounded
    * by k, the Statistics/Ivf precedent), so the corpus is scanned exactly
    * twice and the pass-2 shuffle carries ≤255 groups, not the
    * vocabulary. The oracle twin is the plain exact HAVING form.
    */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame = {
    val toks = Sources.documents(spark, dir)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val mg = udaf(new MisraGries(255))
    val row = toks.agg(mg(col("tok")).as("cands"), count(lit(1)).as("n")).collect()(0)
    val cands: Seq[String] = row.getString(0).split(' ').toSeq.filter(_.nonEmpty)
    val n = row.getLong(1)
    toks.filter(col("tok").isInCollection(cands))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(200L) >= lit(n))
      .orderBy(desc("cnt"), col("tok"))
  }
}
