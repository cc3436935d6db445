package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.ops.{Merge, Similarity, Streaming, Text}

/** ScalaCheck algebraic properties (SURVEY §5.2.3). Small generated
  * inputs, shared SparkSession — each property is a real distributed plan.
  */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  private val keyVals: Gen[List[(Long, Double)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0.0, 100.0)))

  property("upsert idempotence: upsert(upsert(t,s),s) == upsert(t,s)") =
    forAll(keyVals, keyVals) { (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val stage = s.toDF("k", "v").dropDuplicates("k")
      val once = Merge.upsert(target, stage, Seq("k"))
      val twice = Merge.upsert(once, stage, Seq("k"))
      twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
    }

  property("upsert: result keys = target ∪ stage keys") =
    forAll(keyVals, keyVals) { (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val stage = s.toDF("k", "v").dropDuplicates("k")
      val res = Merge.upsert(target, stage, Seq("k"))
      val expect = target.select("k").union(stage.select("k")).distinct().count()
      res.count() == expect && res.select("k").distinct().count() == expect
    }

  property("insertMissing ∘ deleteByKeys on disjoint stage = union") =
    forAll(keyVals) { t =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val stage = target.withColumn("k", col("k") + 1000)
      val res = Merge.insertMissing(target, stage, Seq("k"))
      res.count() == target.count() * 2
    }

  private val texts: Gen[List[String]] =
    Gen.listOfN(20, Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  property("dedup fixpoint + idempotence on generated texts") =
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Text.exactDedup(df, "text", "doc_id")
      val twice = Text.exactDedup(once, "text", "doc_id")
      once.count() == twice.count() &&
        once.count() == df.select("text").distinct().count()
    }

  private val vec: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).suchThat(_.exists(_ != 0f))

  property("cosine symmetry and self-similarity") =
    forAll(vec, vec) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        Similarity.cosine(col("a"), col("b")).as("ab"),
        Similarity.cosine(col("b"), col("a")).as("ba"),
        Similarity.cosine(col("a"), col("a")).as("aa")).head
      math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12 &&
        math.abs(r.getDouble(2) - 1.0) < 1e-9
    }

  private val eventTimes: Gen[List[Long]] =
    Gen.listOfN(25, Gen.choose(0L, 6L * 3600 * 1000000)).map(_.distinct)

  property("sessionization: sessions ≤ events; gaps within session < 30 min") =
    forAll(eventTimes) { usList =>
      val rows = usList.zipWithIndex.map { case (us, i) =>
        (i.toLong, new java.sql.Timestamp(us / 1000), 1L, "view", 1.0)
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      val sessions = Streaming.sessionizeOn(df).collect()
      val nEvents = usList.length
      val gapUs = 30L * 60 * 1000000
      sessions.length <= math.max(nEvents, 1) &&
        sessions.map(_.getLong(3)).sum == nEvents &&
        // sessions are disjoint and separated by >= gap
        sessions.sortBy(_.getLong(1)).sliding(2).forall {
          case Array(s1, s2) => s2.getLong(1) - s1.getLong(2) >= gapUs
          case _ => true
        }
    }

  property("set algebra: (a except b) ∪ (a intersect b) == distinct a") =
    forAll(Gen.listOf(Gen.choose(0L, 20L)), Gen.listOf(Gen.choose(0L, 20L))) { (a, b) =>
      val da = a.toDF("k")
      val db = b.toDF("k")
      val lhs = da.except(db).union(da.intersect(db))
      val rhs = da.distinct()
      lhs.exceptAll(rhs).isEmpty && rhs.exceptAll(lhs).isEmpty
    }

  private val sentences: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("the", "data", "spark", "row", "scan", "merge", "fast", "key")
    val sentence = Gen.listOfN(8, word).map(_.mkString(" "))
    Gen.listOfN(8, sentence).map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) })
  }

  property("ngram jaccard ∈ [0,1]; self-pairs absent; ids ordered") =
    forAll(sentences) { docs =>
      val df = docs.toDF("doc_id", "text")
      val pairs = Text.ngramJaccardPairs(df, "doc_id", "text", 3).collect()
      pairs.forall { r =>
        val j = r.getAs[Double]("jaccard")
        j >= 0.0 && j <= 1.0 && r.getAs[Long]("id_a") < r.getAs[Long]("id_b")
      }
    }

  property("identical texts have jaccard exactly 1") =
    forAll(Gen.listOfN(6, Gen.oneOf("a b c d e f", "x y z w v u"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val same = Text.ngramJaccardPairs(df, "doc_id", "text", 3)
        .join(df.toDF("id_a", "ta"), "id_a")
        .join(df.toDF("id_b", "tb"), "id_b")
        .filter(col("ta") === col("tb")).collect()
      same.forall(_.getAs[Double]("jaccard") == 1.0)
    }

  property("md5 sampling: deterministic and membership-stable across repartitioning") =
    forAll(Gen.listOfN(40, Gen.choose(0L, 10000L))) { ks =>
      val df = ks.distinct.toDF("k")
      val a = graft.ops.Scale.sampleByMd5(df, "k", Seq("0", "1", "2", "3"))
        .collect().map(_.getLong(0)).toSet
      val b = graft.ops.Scale.sampleByMd5(df.repartition(7), "k", Seq("0", "1", "2", "3"))
        .collect().map(_.getLong(0)).toSet
      a == b
    }

  /** Catalog storage roundtrip under random content: nulls, empty strings,
    * unicode and negative keys must all survive the UnsafeRow stream
    * format, and compaction must preserve the exact multiset. This is the
    * property that would catch a length-prefix / buffer-ownership bug in
    * the group-file codec.
    */
  private val catRows: Gen[List[(Long, Option[String], Double)]] =
    Gen.listOfN(25, Gen.zip(
      Gen.choose(-1000L, 1000L),
      Gen.option(Gen.oneOf("", "plain", "ünïcødé ☃", "tab\there", "a" * 300)),
      Gen.choose(-1e6, 1e6)))

  property("catalog group-file roundtrip + compaction preserve random content exactly") =
    forAll(catRows) { rows =>
      spark.conf.set("spark.sql.catalog.graft_prop", "graft.catalog.GraftCatalog")
      spark.sql("DROP TABLE IF EXISTS graft_prop.default.p_rt")
      spark.sql("CREATE TABLE graft_prop.default.p_rt (k BIGINT, v STRING, x DOUBLE)")
      val src = rows.toDF("k", "v", "x")
      src.createOrReplaceTempView("p_rt_src")
      // two inserts → at least two group files, so compaction has work
      spark.sql("INSERT INTO graft_prop.default.p_rt SELECT * FROM p_rt_src WHERE k % 2 = 0")
      spark.sql("INSERT INTO graft_prop.default.p_rt SELECT * FROM p_rt_src WHERE k % 2 != 0")
      val tbl = spark.table("graft_prop.default.p_rt")
      val before = tbl.exceptAll(src).isEmpty && src.exceptAll(tbl).isEmpty
      val cat = spark.sessionState.catalogManager.catalog("graft_prop")
        .asInstanceOf[graft.catalog.GraftCatalog]
      val dir = java.nio.file.Paths.get(cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), "p_rt"))
        .asInstanceOf[graft.catalog.GraftTable].location)
      graft.catalog.GroupFiles.compact(dir, Long.MaxValue)
      val after = spark.table("graft_prop.default.p_rt")
      val compacted = after.exceptAll(src).isEmpty && src.exceptAll(after).isEmpty
      spark.sql("DROP TABLE graft_prop.default.p_rt")
      before && compacted
    }

  private val word: Gen[String] = Gen.chooseNum(0, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("jaroWinkler: symmetric, in [0,1], 1 iff equal (non-empty)") =
    forAll(word, word) { (a, b) =>
      import graft.functions.JaroWinkler.computeStr
      val ab = computeStr(a, b); val ba = computeStr(b, a)
      val range = ab >= 0.0 && ab <= 1.0
      val sym = ab == ba
      val ident = if (a == b) computeStr(a, b) == 1.0
                  else if (a.nonEmpty && b.nonEmpty) true
                  else ab == 0.0 // one side empty, other not
      range && sym && ident
    }

  property("prefix filter == brute-force Jaccard pairs on random corpora") =
    forAll(texts, Gen.oneOf(0.3, 0.5, 0.7)) { (docs, t) =>
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "txt")
      val got = Text.prefixJaccardPairs(df, "id", "txt", w = 2, t = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // driver-side brute force over raw 2-gram shingle sets
      def sh(s: String): Set[String] = {
        val toks = s.split(" ")
        if (toks.length < 2) Set.empty
        else toks.sliding(2).map(_.mkString(" ")).toSet
      }
      val sets = docs.zipWithIndex.map { case (s, i) => i.toLong -> sh(s) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size
        if inter.toDouble >= t * (sa.size + sb.size - inter).toDouble
      } yield (ia, ib)).toSet
      got == want
    }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))

  property("connectedComponents == union-find reference on random graphs") =
    forAll(edgeList) { edges =>
      val nonLoop = edges.filter { case (a, b) => a != b }
      (nonLoop.nonEmpty) ==> {
        val got = graft.ops.Graph.connectedComponents(
            nonLoop.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        nonLoop.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = nonLoop.flatMap(e => Seq(e._1, e._2)).distinct
        val refComp = nodes.groupBy(find).flatMap { case (_, ms) =>
          val root = ms.min; ms.map(_ -> root)
        }.toMap
        got == refComp
      }
    }

  // random bytes AND random bytes behind each real magic prefix — the
  // sniffer must always terminate with a well-formed answer, never throw
  private val magics = Seq[Array[Byte]](
    Array(0x89.toByte) ++ "PNG".getBytes ++ Array[Byte](0x0D, 0x0A, 0x1A, 0x0A),
    Array(0xFF.toByte, 0xD8.toByte),
    "GIF89a".getBytes, "BM".getBytes, "RIFF1234WAVE".getBytes)
  private val hostileBytes: Gen[Array[Byte]] = for {
    prefix <- Gen.oneOf(Gen.const(Array.empty[Byte]), Gen.oneOf(magics))
    tail <- Gen.listOfN(64, Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte))
  } yield prefix ++ tail.toArray

  property("sniffHeader: total on arbitrary hostile input (no throw, no hang, sane dims)") =
    forAll(hostileBytes) { bytes =>
      val (fmt, w, h, sr, ch) = graft.ops.Multimodal.sniffHeader(bytes)
      fmt.nonEmpty &&
        Seq(w, h, sr).flatten.forall(_ > 0) && ch.forall(_ >= 0)
    }

}
