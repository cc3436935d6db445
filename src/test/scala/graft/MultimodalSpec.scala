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

  /** Encode a REAL png/jpeg/bmp/gif with the JDK's own ImageIO — the
    * sniffer is then tested against genuine encoder output, not
    * hand-crafted byte mimicry.
    */
  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
    bos.toByteArray
  }

  /** A genuine RIFF/WAVE file via the JDK's own sound API. */
  private def encodeWav(sampleRate: Int, channels: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val af = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](sampleRate / 100 * 2 * channels)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), af,
      pcm.length / af.getFrameSize)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("sniffHeader: real JDK-encoded PNG/JPEG/BMP/GIF/WAV parse to true dimensions") {
    for (fmt <- Seq("png", "jpeg", "bmp", "gif")) {
      val (got, w, h, _, _) = Multimodal.sniffHeader(encodeImage(fmt, 37, 21))
      assert(got === fmt, s"format $fmt")
      assert(w === Some(37) && h === Some(21), s"$fmt dims: $w x $h")
    }
    val (f1, _, _, sr1, ch1) = Multimodal.sniffHeader(encodeWav(44100, 2))
    assert(f1 === "wav" && sr1 === Some(44100) && ch1 === Some(2))
    val (f2, _, _, sr2, ch2) = Multimodal.sniffHeader(encodeWav(16000, 1))
    assert(f2 === "wav" && sr2 === Some(16000) && ch2 === Some(1))
    // big images exercise the multi-byte-dimension paths
    val (_, bw, bh, _, _) = Multimodal.sniffHeader(encodeImage("png", 1920, 1080))
    assert(bw === Some(1920) && bh === Some(1080))
  }

  test("sniffHeader: garbage, truncation and empty input degrade to unknown, never throw") {
    assert(Multimodal.sniffHeader(Array.empty[Byte])._1 === "unknown")
    assert(Multimodal.sniffHeader("plain text".getBytes)._1 === "unknown")
    val png = encodeImage("png", 37, 21)
    // cut inside the IHDR: magic matches but dims are unreadable
    val cut = java.util.Arrays.copyOf(png, 10)
    assert(Multimodal.sniffHeader(cut)._1 === "unknown")
    // JPEG cut right after SOI: format recognized, no dimensions
    val (f, w, h, _, _) = Multimodal.sniffHeader(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte))
    assert(f === "jpeg" && w.isEmpty && h.isEmpty)
    // fill bytes (FF padding) before a marker must not derail the scan
    val jpg = encodeImage("jpeg", 25, 17)
    val padded = jpg.take(2) ++ Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ jpg.drop(2)
    val (pf, pw, ph, _, _) = Multimodal.sniffHeader(padded)
    assert(pf === "jpeg" && pw === Some(25) && ph === Some(17))
    // NULL payload degrades, never NPEs
    assert(Multimodal.sniffHeader(null)._1 === "unknown")
    // hostile RIFF whose chunk size once int-truncated to a spin: must terminate
    val wav = ("RIFF" + "    " + "WAVE" + "JUNK").getBytes("ISO-8859-1") ++
      Array(0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) // sz = 0xFFFFFFF8
    val r = Multimodal.sniffHeader(wav)
    assert(r._1 === "wav" && r._4.isEmpty, "terminates without finding fmt")
    // hostile BMP with biHeight = Int.MinValue degrades to no height
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      Array[Byte](40, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0x80.toByte) ++ new Array[Byte](4)
    val rb = Multimodal.sniffHeader(bmp)
    assert(rb._1 === "bmp" && rb._3.isEmpty, s"no negative heights: $rb")
  }

  test("mediaMetadata: the partition-batched header kernel over a mixed binary frame") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, encodeImage("png", 40, 30)),
      org.apache.spark.sql.Row(2L, encodeImage("jpeg", 64, 48)),
      org.apache.spark.sql.Row(3L, encodeWav(8000, 1)),
      org.apache.spark.sql.Row(4L, "garbage".getBytes))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType, false)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Multimodal.mediaMetadata(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L) === (("png", Some(40), Some(30), None, None)))
    assert(got(2L) === (("jpeg", Some(64), Some(48), None, None)))
    assert(got(3L) === (("wav", None, None, Some(8000), Some(1))))
    assert(got(4L)._1 === "unknown")
  }

  /** ISO-BMFF box builder (ISO 14496-12 layout) — the JDK ships no MP4
    * encoder, so structurally-valid spec-authored bytes are the honest
    * test input here (unlike the ImageIO formats above).
    */
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private def tkhd(w: Int, h: Int, version: Int): Array[Byte] = {
    val times = if (version == 1) 32 else 20
    val bb = java.nio.ByteBuffer.allocate(4 + times + 52 + 8)
    bb.put(version.toByte).put(new Array[Byte](3 + times + 52))
    bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
    box("tkhd", bb.array())
  }

  private def mp4(w: Int, h: Int, version: Int = 0, extraTrak: Boolean = false): Array[Byte] = {
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    // an audio-style trak (zero dims) first when extraTrak — the sniffer
    // must skip it and report the video trak's dimensions
    val traks = (if (extraTrak) box("trak", tkhd(0, 0, version)) else Array.empty[Byte]) ++
      box("trak", tkhd(w, h, version))
    ftyp ++ box("free", new Array[Byte](4)) ++ box("moov", box("mvhd", new Array[Byte](100)) ++ traks)
  }

  test("sniffHeader mp4: box walk finds the video tkhd dims, v0 and v1, skipping audio traks") {
    val (f0, w0, h0, _, _) = Multimodal.sniffHeader(mp4(640, 360))
    assert(f0 === "mp4" && w0 === Some(640) && h0 === Some(360))
    val (f1, w1, h1, _, _) = Multimodal.sniffHeader(mp4(1920, 1080, version = 1, extraTrak = true))
    assert(f1 === "mp4" && w1 === Some(1920) && h1 === Some(1080))
    // audio-only (all-zero dims): format recognized, no dimensions
    val (fa, wa, ha, _, _) = Multimodal.sniffHeader(mp4(0, 0))
    assert(fa === "mp4" && wa.isEmpty && ha.isEmpty)
    // no moov at all (streaming-style fragmented head): mp4, no dims
    val (fn, wn, _, _, _) = Multimodal.sniffHeader(box("ftyp", "isom".getBytes))
    assert(fn === "mp4" && wn.isEmpty)
  }

  test("sniffHeader mp4: corrupt sizes terminate without dims, never spin or throw") {
    // box claiming size beyond the buffer
    val bad = mp4(10, 10).clone()
    bad(0) = 0x7F.toByte // ftyp size becomes enormous
    assert(Multimodal.sniffHeader(bad)._1 === "mp4")
    // size < 8 (no forward progress) inside moov
    val tiny = box("ftyp", "isom".getBytes) ++ box("moov", Array[Byte](0, 0, 0, 2, 't', 'r', 'a', 'k'))
    val r = Multimodal.sniffHeader(tiny)
    assert(r._1 === "mp4" && r._2.isEmpty)
    // truncated mid-tkhd
    val cut = java.util.Arrays.copyOf(mp4(640, 360), 60)
    assert(Multimodal.sniffHeader(cut)._1 === "mp4")
  }

  /** A valid MPEG1 Layer III frame header: FF FB = sync + MPEG1 + layer
    * III + no CRC; byte 2 = bitrate/samplerate indices; byte 3 = mode.
    */
  private def mp3Frame(rateIdx: Int, mono: Boolean): Array[Byte] = {
    val b2 = (9 << 4) | (rateIdx << 2) // bitrate idx 9 = 128k, pad 0
    val b3 = (if (mono) 3 else 1) << 6
    Array(0xFF.toByte, 0xFB.toByte, b2.toByte, b3.toByte) ++ new Array[Byte](32)
  }

  private def id3(size: Int): Array[Byte] =
    "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array(((size >> 21) & 0x7F).toByte, ((size >> 14) & 0x7F).toByte,
            ((size >> 7) & 0x7F).toByte, (size & 0x7F).toByte)

  test("sniffHeader mp3: bare frame, ID3v2-prefixed frame, mono flag, rate table") {
    val (f, _, _, sr, ch) = Multimodal.sniffHeader(mp3Frame(0, mono = false))
    assert(f === "mp3" && sr === Some(44100) && ch === Some(2))
    val (f2, _, _, sr2, ch2) = Multimodal.sniffHeader(mp3Frame(1, mono = true))
    assert(f2 === "mp3" && sr2 === Some(48000) && ch2 === Some(1))
    // ID3v2 tag (syncsafe size 300) then padding then the frame
    val tagged = id3(300) ++ new Array[Byte](300) ++ mp3Frame(2, mono = false)
    val (f3, _, _, sr3, _) = Multimodal.sniffHeader(tagged)
    assert(f3 === "mp3" && sr3 === Some(32000))
    // ID3 with no audible frame within the scan bound: mp3, no rate
    val silent = id3(8) ++ new Array[Byte](8)
    val r = Multimodal.sniffHeader(silent)
    assert(r._1 === "mp3" && r._4.isEmpty)
    // reserved version bits (FF E8) must not claim a rate
    val bad = Array(0xFF.toByte, 0xE8.toByte, 0x24.toByte, 0x00.toByte)
    assert(Multimodal.sniffHeader(bad)._4.isEmpty)
  }

  /** Hand-built EXIF APP1 JPEG head (spec-authored, ISO/TIFF layout). */
  private def exifJpeg(orientation: Int, littleEndian: Boolean,
                       extraEntryFirst: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(128)
      .order(if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    val n = if (extraEntryFirst) 2 else 1
    bb.put(if (littleEndian) 'I'.toByte else 'M'.toByte)
      .put(if (littleEndian) 'I'.toByte else 'M'.toByte)
      .putShort(42).putInt(8)        // IFD0 at offset 8 from TIFF start
      .putShort(n.toShort)
    if (extraEntryFirst) {           // an unrelated LONG entry before it
      bb.putShort(0x0100.toShort).putShort(4).putInt(1).putInt(640)
    }
    bb.putShort(0x0112.toShort).putShort(3).putInt(1)
      .putShort(orientation.toShort).putShort(0)
    bb.putInt(0)                      // next-IFD pointer
    val tiff = java.util.Arrays.copyOf(bb.array(), bb.position())
    val payload = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++ tiff
    val app1Len = payload.length + 2
    Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
          ((app1Len >> 8) & 0xFF).toByte, (app1Len & 0xFF).toByte) ++ payload
  }

  test("exif orientation: both endiannesses, entry scan, absence and garbage -> None") {
    assert(Multimodal.exifOrientation(exifJpeg(6, littleEndian = true)) === Some(6))
    assert(Multimodal.exifOrientation(exifJpeg(8, littleEndian = false)) === Some(8))
    assert(Multimodal.exifOrientation(
      exifJpeg(3, littleEndian = true, extraEntryFirst = true)) === Some(3))
    // out-of-range orientation rejected
    assert(Multimodal.exifOrientation(exifJpeg(9, littleEndian = true)).isEmpty)
    // a real JDK JPEG carries no EXIF -> None, and still sniffs as jpeg
    val plain = encodeImage("jpeg", 20, 10)
    assert(Multimodal.exifOrientation(plain).isEmpty)
    assert(Multimodal.sniffHeader(plain)._1 === "jpeg")
    // truncation inside the TIFF never throws
    val cut = java.util.Arrays.copyOf(exifJpeg(6, littleEndian = true), 20)
    assert(Multimodal.exifOrientation(cut).isEmpty)
    assert(Multimodal.exifOrientation(null).isEmpty)
    assert(Multimodal.exifOrientation("not a jpeg".getBytes).isEmpty)
  }

  test("exif orientation: XMP APP1 before the Exif APP1 is skipped, not fatal") {
    val exif = exifJpeg(6, littleEndian = true)
    val exifPayload = exif.drop(6) // APP1 payload incl. Exif header
    val xmp = "http://ns.adobe.com/xap/1.0/\u0000<x:xmpmeta/>".getBytes("ISO-8859-1")
    val xmpLen = xmp.length + 2
    val both = Array(0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE1.toByte, ((xmpLen >> 8) & 0xFF).toByte, (xmpLen & 0xFF).toByte) ++ xmp ++
      Array(0xFF.toByte, 0xE1.toByte,
            (((exifPayload.length + 2) >> 8) & 0xFF).toByte,
            ((exifPayload.length + 2) & 0xFF).toByte) ++ exifPayload
    assert(Multimodal.exifOrientation(both) === Some(6))
  }

  test("syntheticMediaBytes: builder bytes parse back to the exact formula dims (roundtrip)") {
    // the q_media_meta contract in miniature: for each format, sniffHeader
    // over the built bytes must return precisely the doc_id formulas
    for (id <- Seq(0L, 1L, 2L, 3L, 299L, 1000L, 65537L)) {
      val b = Multimodal.syntheticMediaBytes(id)
      val (fmt, w, h, sr, ch) = Multimodal.sniffHeader(b)
      (id % 3) match {
        case 0 =>
          assert(fmt === "png")
          assert(w === Some(Multimodal.synthPngW(id)) && h === Some(Multimodal.synthPngH(id)))
        case 1 =>
          assert(fmt === "wav")
          assert(sr === Some(Multimodal.synthWavRate(id)) && ch === Some(Multimodal.synthWavCh(id)))
        case _ =>
          assert(fmt === "mp4")
          assert(w === Some(Multimodal.synthMp4W(id)) && h === Some(Multimodal.synthMp4H(id)))
      }
    }
  }

  test("decodeFeatures: REAL header dims flow into the feature frame when a header exists") {
    import spark.implicits._
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType, false))))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(3L, "image", Multimodal.syntheticMediaBytes(3L)),  // PNG id=3
        org.apache.spark.sql.Row(7L, "image", "no header here".getBytes("UTF-8"))), // stub path
      enc.schema)
    val rows = Multimodal.decodeFeatures(media).collect().map(r => r.getLong(0) -> r).toMap
    // id=3: PNG header dims (the formulas), NOT the byte-hash stub
    assert(rows(3L).getInt(2) === Multimodal.synthPngW(3L))
    assert(rows(3L).getInt(3) === Multimodal.synthPngH(3L))
    // id=7: headerless payload falls back to the deterministic stub (>= 64)
    assert(rows(7L).getInt(2) >= 64 && rows(7L).getInt(3) >= 64)
  }
}
