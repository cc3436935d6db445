package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources

/** End-to-end training-data corpus preparation (north-star composition):
  * the operators of Text/MinHash/Similarity chained the way a 100 TB
  * pipeline runs them — cheap filters first, exact dedup next, the
  * quadratic-ish near-dup detection last and only over survivors.
  *
  * Stage order matters at scale: each stage shrinks the data the next
  * (more expensive) stage touches, and every stage is a pure DataFrame
  * transform — the whole pipeline is ONE lazy plan until the sink.
  */
object Pipeline {

  final case class CorpusStats(
      input: Long, afterQuality: Long, afterExactDedup: Long, afterNearDedup: Long)

  /** Quality gate → exact dedup → MinHash near-dup removal. Returns the
    * cleaned corpus with quality/language/token annotations attached.
    */
  def prepareCorpus(docs: DataFrame, minQuality: Double = 0.3,
                    nearDupEstimate: Double = 0.9): DataFrame = {
    // 1. cheap per-row annotations + gate (no shuffle)
    val annotated = Text.tokenCounts(
      Text.languageId(Text.qualityScore(docs, "text"), "text"), "text")
    val gated = annotated.filter(col("quality") >= minQuality)
    // 2. exact dedup — one shuffle on the content hash
    val exact = Text.exactDedup(gated, "text", "doc_id")
    // 3. near-dup: banded MinHash candidates, drop the higher doc_id of
    //    any pair whose estimated Jaccard clears the threshold
    val dupIds = MinHash.candidatePairs(exact, "doc_id", "text")
      .filter(col("est") >= nearDupEstimate)
      .select(col("id_b").as("doc_id")).distinct()
    exact.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Stage-by-stage row counts (each count is a separate job; use for
    * audits, not in the hot path).
    */
  def corpusStats(docs: DataFrame, minQuality: Double = 0.3,
                  nearDupEstimate: Double = 0.9): CorpusStats = {
    val annotated = Text.tokenCounts(
      Text.languageId(Text.qualityScore(docs, "text"), "text"), "text")
    val gated = annotated.filter(col("quality") >= minQuality)
    val exact = Text.exactDedup(gated, "text", "doc_id")
    val cleaned = prepareCorpus(docs, minQuality, nearDupEstimate)
    CorpusStats(docs.count(), gated.count(), exact.count(), cleaned.count())
  }

  /** Convenience entry over the test corpus. */
  def prepareDocuments(spark: SparkSession, dir: String): DataFrame =
    prepareCorpus(Sources.documents(spark, dir))

  /** q_pipeline_corpus: the oracle-exact pipeline twin — quality gate →
    * exact dedup (keep min doc_id per content hash) → EXACT n-gram-Jaccard
    * near-dup removal (drop the higher id of each pair ≥ 0.5, single
    * pass) → per-language survivor stats. Same stage order as
    * prepareCorpus; the approximate MinHash stage is swapped for the exact
    * pair miner so every stage is DuckDB-checkable end-to-end.
    */
  def pipelineQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val gated = Text.qualityScore(Sources.documents(spark, dir), "text")
      .filter(col("quality") >= 0.3)
    val ded = Text.exactDedup(gated, "text", "doc_id")
    val dupIds = Text.ngramJaccardPairs(ded, "doc_id", "text", 3)
      .filter(r6(col("jaccard")) >= 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    ded.join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }
}
