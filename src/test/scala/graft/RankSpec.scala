package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Rank

/** Property tests for the two-phase exact-rank family (ops/Rank.scala):
  * each helper must equal its naive window form on every input — the
  * helpers exist for SCALE (grid-grain parallelism instead of
  * |constant-domain| window tasks), never for different answers.
  * Adversarial shapes: heavy ties (many rows per metric value), skewed
  * chunks (one grid cell holding most rows), n < k, single-row segments,
  * negative metrics, and a step so large everything lands in one chunk
  * (degenerates to the naive form — still exact).
  */
class RankSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // deterministic pseudo-random rows: (segment 0..4, metric with heavy
  // ties and skew, unique id as tiebreak)
  private def rows(n: Int): Seq[(String, Long, Long)] =
    (0 until n).map { i =>
      val seg = "s" + (i % 5)
      val metric =
        if (i % 7 == 0) 42L // hot tie value
        else ((i * 2654435761L) % 1000) * ((i % 3) + 1)
      (seg, metric, i.toLong)
    }

  test("ntileExact equals ntile() over (partition by seg order by metric, id) — asc and desc") {
    val df = rows(400).toDF("seg", "m", "id")
    for (k <- Seq(1, 3, 4, 10); step <- Seq(1L, 17L, 1000000L); desc <- Seq(false, true)) {
      val got = Rank.ntileExact(df, "seg", col("m"), col("id"), k, Rank.StepGrid(step), desc, "b")
      val w =
        if (desc) Window.partitionBy(col("seg")).orderBy(col("m").desc, col("id"))
        else Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))
      val want = df.withColumn("b", ntile(k).over(w))
      assert(got.select("seg", "m", "id", "b").exceptAll(want.select("seg", "m", "id", "b")).isEmpty &&
             want.select("seg", "m", "id", "b").exceptAll(got.select("seg", "m", "id", "b")).isEmpty,
        s"k=$k step=$step desc=$desc")
    }
  }

  test("ntileExact: n < k fills one row per bucket (rank order)") {
    val tiny = Seq(("a", 5L, 1L), ("a", 3L, 2L), ("b", 9L, 3L)).toDF("seg", "m", "id")
    val got = Rank.ntileExact(tiny, "seg", col("m"), col("id"), 10, Rank.StepGrid(4L), desc = false, "b")
      .select("seg", "id", "b").as[(String, Long, Int)].collect().toSet
    assert(got === Set(("a", 2L, 1), ("a", 1L, 2), ("b", 3L, 1)))
  }

  test("rankExact equals row_number(); negative metrics rank correctly across chunk 0") {
    // negative metric: floor division must keep chunk order monotone
    val df = rows(300).map { case (s, m, id) => (s, m - 500, id) }.toDF("seg", "m", "id")
    val got = Rank.rankExact(df, "seg", col("m"), col("id"), Rank.StepGrid(13L), desc = false, "r")
    val w = Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))
    val want = df.withColumn("r", row_number().over(w).cast("long"))
    assert(got.select("seg", "m", "id", "r").exceptAll(want.select("seg", "m", "id", "r")).isEmpty &&
           want.select("seg", "m", "id", "r").exceptAll(got.select("seg", "m", "id", "r")).isEmpty)
  }

  test("rankCumsum equals rank + running sum + per-seg totals (desc)") {
    val df = rows(250).toDF("seg", "m", "id").withColumn("v", col("m") * 3 + 1)
    val got = Rank.rankCumsum(df, "seg", col("m"), col("id"), col("v"),
      Rank.StepGrid(50L), desc = true, "r", "cum", "n", "tot")
    val w = Window.partitionBy(col("seg")).orderBy(col("m").desc, col("id"))
    val want = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("seg"))))
      .withColumn("tot", sum(col("v")).over(Window.partitionBy(col("seg"))))
    val cols = Seq("seg", "m", "id", "v", "r", "cum", "n", "tot").map(col)
    assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).isEmpty &&
           want.select(cols: _*).exceptAll(got.select(cols: _*)).isEmpty)
  }

  test("gridFor: shifted AND mass-clustered domains re-derive a usable grid (VERDICT r10 #3)") {
    // the two shapes a hard-coded (or even min/max-derived) step misses:
    // values in the BILLIONS (domain shift) clustered into two narrow
    // humps (mass skew) — an equi-depth grid must still spread the rows
    val wide = (0 until 4000).map { i =>
      val m = if (i % 3 == 0) 5_000_000_000L + i else 9_000_000_000L - i * 7L
      ("s" + (i % 5), m, i.toLong)
    }.toDF("seg", "m", "id")
    val grid = Rank.gridFor(wide, col("m"), targetChunks = 64)
    val occupancy = wide.select(grid.chunkOf(col("m")).as("c"))
      .groupBy("c").count().agg(max("count"), countDistinct("c")).head()
    val (maxPerChunk, nChunks) = (occupancy.getLong(0), occupancy.getLong(1))
    assert(nChunks > 10, s"grid collapsed: $nChunks chunks")
    assert(maxPerChunk <= 4000 / 10, s"equi-depth violated: $maxPerChunk rows in one chunk")
    val got = Rank.rankExact(wide, "seg", col("m"), col("id"), grid, desc = false, "r")
    val w = Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))
    val want = wide.withColumn("r", row_number().over(w).cast("long"))
    assert(got.select("seg", "m", "id", "r").exceptAll(want.select("seg", "m", "id", "r")).isEmpty &&
           want.select("seg", "m", "id", "r").exceptAll(got.select("seg", "m", "id", "r")).isEmpty)

    // tiny-NDV domain: boundaries dedupe to the value set (the finest
    // exact grid possible — ties must share a chunk) and ranks stay exact
    val narrow = (0 until 100).map(i => ("s" + (i % 3), (i % 4).toLong, i.toLong))
      .toDF("seg", "m", "id")
    val ng = Rank.gridFor(narrow, col("m"))
    val gotN = Rank.rankExact(narrow, "seg", col("m"), col("id"), ng, desc = false, "r")
    val wantN = narrow.withColumn("r",
      row_number().over(Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))).cast("long"))
    assert(gotN.select("seg", "m", "id", "r").exceptAll(wantN.select("seg", "m", "id", "r")).isEmpty &&
           wantN.select("seg", "m", "id", "r").exceptAll(gotN.select("seg", "m", "id", "r")).isEmpty)

    // empty input: degenerate but legal grid (everything in chunk 0)
    assert(Rank.gridFor(narrow.filter(col("m") < 0), col("m")) === Rank.BoundsGrid(Nil))
  }

  test("gridFor: FRACTIONAL [0,1) metric gets a non-degenerate double grid (ADVICE r11)") {
    // the round-11 bug: metric.cast('long') truncated a quality score in
    // [0,1) to 0 everywhere — the probe deduped to ~1 boundary and the
    // "≈256-chunk" rank silently became ONE full-corpus sort task
    val frac = (0 until 4000)
      .map(i => ("s" + (i % 3), (i % 997).toDouble / 997.0, i.toLong))
      .toDF("seg", "m", "id")
    val grid = Rank.gridFor(frac, col("m"), targetChunks = 64)
    assert(grid.isInstanceOf[Rank.DoubleBoundsGrid], s"expected double grid, got $grid")
    val occupancy = frac.select(grid.chunkOf(col("m")).as("c"))
      .groupBy("c").count().agg(max("count"), countDistinct("c")).head()
    val (maxPerChunk, nChunks) = (occupancy.getLong(0), occupancy.getLong(1))
    assert(nChunks > 10, s"fractional grid collapsed: $nChunks chunks")
    assert(maxPerChunk <= 4000 / 10, s"equi-depth violated: $maxPerChunk rows in one chunk")
    val got = Rank.rankExact(frac, "seg", col("m"), col("id"), grid, desc = false, "r")
    val want = frac.withColumn("r",
      row_number().over(Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))).cast("long"))
    assert(got.select("seg", "m", "id", "r").exceptAll(want.select("seg", "m", "id", "r")).isEmpty &&
           want.select("seg", "m", "id", "r").exceptAll(got.select("seg", "m", "id", "r")).isEmpty)
    // and ntile (the q_score_deciles shape) matches the window form too
    val gotT = Rank.ntileExact(frac, "seg", col("m"), col("id"), 10, grid, desc = false, "d")
    val wantT = frac.withColumn("d",
      ntile(10).over(Window.partitionBy(col("seg")).orderBy(col("m"), col("id"))))
    assert(gotT.select("seg", "m", "id", "d").exceptAll(wantT.select("seg", "m", "id", "d")).isEmpty &&
           wantT.select("seg", "m", "id", "d").exceptAll(gotT.select("seg", "m", "id", "d")).isEmpty)
  }

  test("topK equals window top-k for any repartitioning of the input") {
    val df = rows(300).toDF("seg", "m", "id")
    for (k <- Seq(1, 3, 10); parts <- Seq(1, 7)) {
      val in = df.repartition(parts)
      val got = Rank.topK(in, Seq("seg"), Seq(col("m").desc, col("id")), k, "rn")
      val w = Window.partitionBy(col("seg")).orderBy(col("m").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
      assert(got.select("seg", "m", "id", "rn").exceptAll(want.select("seg", "m", "id", "rn")).isEmpty &&
             want.select("seg", "m", "id", "rn").exceptAll(got.select("seg", "m", "id", "rn")).isEmpty,
        s"k=$k parts=$parts")
    }
  }
}
