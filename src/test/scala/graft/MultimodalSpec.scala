package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("synthetic media table matches the declared schema") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    assert(m.schema.map(f => f.name -> f.dataType.simpleString) ===
      Multimodal.mediaSchema.map(f => f.name -> f.dataType.simpleString))
    assert(m.count() === 500)
    assert(m.select("kind").distinct().count() === 3)
  }

  test("decodeFeatures: deterministic, schema-stable, one row per media") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    val f1 = Multimodal.decodeFeatures(m)
    assert(f1.schema.map(_.name) === Multimodal.featureSchema.map(_.name))
    assert(f1.count() === m.count())
    val f2 = Multimodal.decodeFeatures(m)
    assert(f1.exceptAll(f2).isEmpty, "stub decode must be deterministic")
    assert(f1.filter(col("feature").isNull || size(col("feature")) =!= 8).count() === 0)
  }

  test("video frame sampling: every stride-th frame, none out of range") {
    val f = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, sfDir))
    val s = Multimodal.sampleFrames(f, 10)
    val bad = s.filter(
      exists(col("sampled_frames"), i => i % 10 =!= 0 || i >= col("n_frames")))
    assert(bad.count() === 0)
    assert(s.filter(col("n_sampled") =!= expr("(n_frames + 9) div 10")).count() === 0)
  }

  test("dedupMedia: planted duplicate payloads collapse to the lowest media_id") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.syntheticMedia(spark, sfDir)
    val dup = media.filter(col("media_id") < 5).withColumn("media_id", col("media_id") + 100000)
    val out = Multimodal.dedupMedia(media.unionByName(dup))
    assert(out.count() === media.count())              // dups dropped
    assert(out.filter(col("media_id") >= 100000).count() === 0)  // originals kept
  }

  test("visionTokenBudget: patches scale with dimensions; video frames multiply") {
    import org.apache.spark.sql.functions._
    val feats = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, sfDir))
    val b = Multimodal.visionTokenBudget(feats, patch = 14)
    val rows = b.select("width", "height", "n_frames", "n_vision_tokens").collect()
    rows.foreach { r =>
      val expected = math.ceil(r.getInt(0) / 14.0).toLong * math.ceil(r.getInt(1) / 14.0).toLong * r.getInt(2)
      assert(r.getLong(3) === expected)
    }
  }

  test("resizePlan: aspect ratio preserved, never upscales, fits the box, dims >= 1") {
    import spark.implicits._
    val feats = Seq((1L, 2048, 1024), (2L, 100, 300), (3L, 50, 50), (4L, 1, 10000))
      .toDF("media_id", "width", "height")
    val planned = Multimodal.resizePlan(feats, 512).collect()
    planned.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      val s = r.getAs[Double]("scale")
      assert(s <= 1.0 && s > 0.0, "never upscale")
      assert(ow <= 512 || w <= 512, s"width fits the box or was already smaller: $ow")
      assert(oh <= 512 || h <= 512)
      assert(ow >= 1 && oh >= 1)
      // aspect ratio preserved within rounding
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) <= 1.0)
    }
    // the small image is untouched
    val small = planned.find(_.getLong(0) == 3L).get
    assert(small.getAs[Int]("out_width") === 50 && small.getAs[Int]("out_height") === 50)
  }

  test("binaryFile ingestion: glob prunes at listing, payloads intact, dedup collapses copies") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.png"), Array[Byte](1, 2, 3, 4)) // duplicate content
    Files.write(dir.resolve("c.png"), Array[Byte](9, 9))
    Files.write(dir.resolve("notes.txt"), "not media".getBytes)
    val media = Multimodal.readMediaDir(spark, dir.toString, "*.png")
    val rows = media.collect()
    assert(rows.length === 3, "glob must exclude the .txt at listing time")
    assert(rows.forall(_.getAs[String]("kind") == "png"))
    // payload bytes survive byte-for-byte
    val contents = rows.map(_.getAs[Array[Byte]]("content").toSeq).sortBy(_.length)
    assert(contents.count(_ == Seq[Byte](1, 2, 3, 4)) === 2)
    assert(contents.count(_ == Seq[Byte](9, 9)) === 1)
    // content-addressed dedup keeps one row per distinct payload
    val kept = Multimodal.dedupMedia(media).collect()
    assert(kept.length === 2)
    // meta carries true file length
    assert(rows.forall(r => r.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("bytes") == r.getAs[Array[Byte]]("content").length.toLong))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

}
