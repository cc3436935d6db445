package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Sources
import graft.ops.Pipeline

class PipelineSpec extends AnyFunSuite with SparkFixture {

  test("prepareCorpus: monotone shrinking stages, all annotations attached") {
    val stats = Pipeline.corpusStats(Sources.documents(spark, sfDir))
    assert(stats.input === 500)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExactDedup <= stats.afterQuality)
    assert(stats.afterNearDedup <= stats.afterExactDedup)
    assert(stats.afterNearDedup > 0)
    val cleaned = Pipeline.prepareDocuments(spark, sfDir)
    assert(Seq("quality", "lang_pred", "n_tokens_ws", "n_tokens_bpe")
      .forall(cleaned.columns.contains))
  }

  test("prepareCorpus removes planted exact and near duplicates") {
    val base = Sources.documents(spark, sfDir)
    val exactDupes = base.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 10000)
    val corpus = base.unionByName(exactDupes)
    val cleaned = Pipeline.prepareCorpus(corpus)
    // planted copies share text with a lower-id original → all removed
    assert(cleaned.filter(col("doc_id") >= 10000).count() === 0)
  }

  test("pipeline is deterministic across runs") {
    val a = Pipeline.prepareDocuments(spark, sfDir).select("doc_id")
    val b = Pipeline.prepareDocuments(spark, sfDir).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("pipelineQuery: survivor counts bounded by corpus; all langs non-negative") {
    val total = graft.io.Sources.documents(spark, sfDir).count()
    val rows = graft.ops.Pipeline.pipelineQuery(spark, sfDir).collect()
    val kept = rows.map(_.getLong(1)).sum
    assert(kept > 0 && kept <= total)
  }

}
