package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Geo

class GeoSpec extends AnyFunSuite with SparkFixture {

  test("haversine: zero at identity, symmetric, matches a known city pair") {
    import spark.implicits._
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a1", "o1", "a2", "o2")
    val d = df.select(
      Geo.haversineKm(col("a1"), col("o1"), col("a2"), col("o2")).as("d"),
      Geo.haversineKm(col("a2"), col("o2"), col("a1"), col("o1")).as("r"),
      Geo.haversineKm(col("a1"), col("o1"), col("a1"), col("o1")).as("z"))
      .collect()(0)
    // Paris -> London great-circle ~ 343-344 km
    assert(d.getDouble(0) > 330 && d.getDouble(0) < 355, s"got ${d.getDouble(0)}")
    assert(math.abs(d.getDouble(0) - d.getDouble(1)) < 1e-9)
    assert(d.getDouble(2) === 0.0)
  }

  test("geo join: 5x3 neighborhood finds the cross-two-cell pair at high latitude") {
    import spark.implicits._
    // advisor-supplied adversarial pair: lat ~50 (1 deg lon ~= 71.6 km),
    // lons 1.999 and 4.049 are ~146.5 km apart but sit in lon cells 0 and
    // 2 — a 3x3 neighborhood silently drops the pair; 5x3 must keep it
    val pts = Seq((20L, 49.99, 1.999), (21L, 49.99, 4.049)).toDF("id", "lat", "lon")
    val rows = Geo.geoJoinOn(pts).collect()
    assert(rows.length === 1, s"probe 20 must see neighbor 21: ${rows.mkString}")
    assert(rows(0).getLong(0) === 20L && rows(0).getLong(2) === 21L)
    assert(rows(0).getDouble(3) > 140 && rows(0).getDouble(3) < 150)
  }

  test("geo join: cell-neighborhood candidates equal the brute-force radius join (sf0.01)") {
    // sf0.01 (1500 points, 75 probes): large enough that high-latitude
    // cross-cell pairs occur; brute force is 2.25M driver-side pairs
    assume(sfDirExists("sf0.01"), "sf0.01 testdata absent — cancelling, not failing")
    val dir = sfDirFor("sf0.01")
    val rows = Geo.geoJoin(spark, dir).collect()
    assert(rows.nonEmpty)
    val pts = Geo.syntheticPoints(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2) / 2
      val dLon = math.toRadians(b._3 - a._3) / 2
      val x = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          math.sin(dLon) * math.sin(dLon)
      math.rint(12742.0 * math.asin(math.sqrt(x)) * 1e6) / 1e6
    }
    val brute = pts.filter(p => p._1 % 20 == 0 && p._1 <= 3000).map { a =>
      val ns = pts.filter(b => b._1 != a._1).map(b => (hav(a, b), b._1))
        .filter(_._1 <= 150.0).sorted
      (a._1, ns.length, ns.headOption)
    }.filter(_._2 > 0).sortBy(_._1)
    assert(rows.map(_.getLong(0)).toSeq === brute.map(_._1).toSeq)
    rows.zip(brute).foreach { case (r, (_, n, head)) =>
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === head.get._2)
      assert(math.abs(r.getDouble(3) - head.get._1) < 1e-5)
    }
  }
}
