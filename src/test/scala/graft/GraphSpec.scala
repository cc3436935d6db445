package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Graph, Text}

class GraphSpec extends AnyFunSuite with SparkFixture {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separate components get their own min-id labels") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a path graph converges to one component (diameter > 1 round)") {
    // 0-1-2-...-9 as a chain: min label must travel 9 hops
    val got = components((0L until 9L).map(i => (i, i + 1)))
    assert(got.size === 10)
    assert(got.values.toSet === Set(0L))
  }

  test("edge direction and duplicate edges are irrelevant") {
    val got = components(Seq((5L, 3L), (3L, 5L), (5L, 3L), (3L, 4L)))
    assert(got === Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("cycles converge") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L)))
    assert(got.values.toSet === Set(1L))
  }

  test("NULL edge endpoints are dropped, empty edge set yields empty result") {
    import spark.implicits._
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), None), (None, Some(4L)))
      .toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
    assert(Graph.connectedComponents(Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() === 0)
  }

  test("pageRank: hand-computed 2-round values on a 3-node graph") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1; outdeg: 1->2, 2->1, 3->1; r0 = 1
    // r1(1) = .15 + .85*r0(3)        = 1.0
    // r1(2) = .15 + .85*(r0(1)/2)    = 0.575
    // r1(3) = .15 + .85*(r0(1)/2 + r0(2)) = 1.425
    // r2(1) = .15 + .85*1.425        = 1.36125
    // r2(2) = .15 + .85*0.5          = 0.575
    // r2(3) = .15 + .85*(0.5 + 0.575) = 1.06375
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.36125) < 1e-12)
    assert(math.abs(got(2L) - 0.575) < 1e-12)
    assert(math.abs(got(3L) - 1.06375) < 1e-12)
  }

  test("pageRank: sink nodes keep baseline rank; every node gets a row") {
    import spark.implicits._
    // star into node 9 (a sink), plus isolated-pair 20->21
    val edges = (1L to 4L).map(i => (i, 9L)) ++ Seq((20L, 21L))
    val got = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 7)
    // sources have no in-edges -> rank settles at 1-d = 0.15
    (1L to 4L).foreach(i => assert(math.abs(got(i) - 0.15) < 1e-12))
    // the sink accumulates: .15 + .85*4*.15 = 0.66 at fixpoint (from round 2)
    assert(math.abs(got(9L) - 0.66) < 1e-12)
    assert(math.abs(got(21L) - (0.15 + 0.85 * 0.15)) < 1e-12)
  }

  test("dedup clusters: every cluster has exactly one canonical doc = its min id") {
    val res = Text.dedupClustersQuery(spark, sfDir).collect()
    assert(res.nonEmpty, "sf data must contain near-dup clusters")
    val byCluster = res.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getLong(0))
      assert(ids.min === cid, s"cluster id must be the min member id ($cid vs ${ids.min})")
      assert(members.count(_.getInt(2) == 1) === 1, s"cluster $cid needs exactly one canonical")
      assert(members.filter(_.getInt(2) == 1).head.getLong(0) === cid)
      assert(ids.length >= 2, s"cluster $cid should have >= 2 members (edges imply pairs)")
    }
  }

  test("clusters are consistent with the thresholded LSH pairs") {
    // every est_j >= 0.5 pair must land in the same cluster
    val pairs = Text.lshScoredCandidates(spark, sfDir)
      .filter(col("est_j") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = Text.dedupClustersQuery(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) === cluster(b), s"pair ($a,$b) split across clusters")
    }
  }

  private def triangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Graph.triangleCount(edges.toDF("u", "v")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangle count: known small graphs") {
    // one triangle
    assert(triangles(Seq((1L, 2L), (1L, 3L), (2L, 3L))) === ((3L, 3L, 1L)))
    // square without diagonals: 0 triangles
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))._3 === 0L)
    // K4: 4 triangles
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triangles(k4) === ((4L, 6L, 4L)))
    // K4 plus a pendant edge: still 4
    assert(triangles(k4 :+ (4L -> 9L))._3 === 4L)
  }

  test("triangle count: orientation is semantically invisible (matches naive count)") {
    // random-ish deterministic graph; naive count via triple loop
    val rng = new scala.util.Random(7)
    val edges = (for (_ <- 1 to 120) yield {
      val a = rng.nextInt(20).toLong; val b = rng.nextInt(20).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val adj = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var naive = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } naive += 1
    assert(triangles(edges)._3 === naive)
  }

  test("bfs hops: path graph distances; unreachable and beyond-horizon nodes absent") {
    import spark.implicits._
    // path 0-1-2-3-4 plus an island 10-11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val got = Graph.bfsHops(edges, src = 0L, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3),
      "node 4 is beyond the horizon; the island is unreachable")
    // direction must not matter
    val rev = Graph.bfsHops(edges, src = 4L, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rev === Map(4L -> 0, 3L -> 1, 2L -> 2))
  }

  test("q_triangle_count declared query: sf0.001 co-order graph is complete K10") {
    // all 45 supplier pairs share >= 5 orders at sf0.001 -> C(10,3) triangles
    val r = Graph.triangleCountQuery(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((10L, 45L, 120L)))
  }

  test("jaccard neighbors: equals the brute per-edge set computation") {
    val edges = Graph.coOrderEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
    val got = Graph.jaccardNeighborsQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == edges.toSet)
    edges.foreach { case (u, v) =>
      val common = (nbrs(u) intersect nbrs(v)).size.toLong
      val union = (nbrs(u) union nbrs(v)).size.toLong // includes u and v themselves
      val (gc, gj) = got((u, v))
      assert(gc == common, s"($u,$v): common $gc vs $common")
      assert(math.abs(gj - common.toDouble / union) < 1e-6, s"($u,$v): jacc")
    }
  }

  test("assortativity: moments equal the brute edge sweep; r is NULL exactly on zero variance") {
    import graft.ops.Graph
    val edges = Graph.coOrderEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val m = edges.length.toLong
    val sJk = edges.map { case (u, v) => deg(u) * deg(v) }.sum
    val sSum = edges.map { case (u, v) => deg(u) + deg(v) }.sum
    val sSq = edges.map { case (u, v) => deg(u) * deg(u) + deg(v) * deg(v) }.sum
    val row = Graph.assortativityQuery(spark, sfDir).collect()(0)
    assert(row.getLong(0) == m && row.getLong(1) == sJk &&
           row.getLong(2) == sSum && row.getLong(3) == sSq)
    val zeroVar = sSq * m * 2 == sSum * sSum
    if (zeroVar) assert(row.isNullAt(4), "zero-variance graph must yield NULL r")
    else {
      val mu = sSum.toDouble / (2 * m)
      val brute = (sJk.toDouble / m - mu * mu) / (sSq.toDouble / (2 * m) - mu * mu)
      assert(math.abs(row.getDouble(4) - brute) < 1e-5)
      assert(row.getDouble(4) >= -1.0 - 1e-9 && row.getDouble(4) <= 1.0 + 1e-9)
    }
  }
}
