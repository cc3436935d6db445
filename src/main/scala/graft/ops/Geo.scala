package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources

/** Geospatial operators (north-star extension): distance math and the
  * CELL-BUCKETED SPATIAL JOIN — the shape every engine without a spatial
  * index uses at scale (geohash/S2/H3 alike): bucket points into grid
  * cells sized >= the search radius, equi-join on the 3x3 cell
  * neighborhood (complete by construction: two points within r cannot be
  * more than one cell apart when cell >= r), then verify exactly with
  * haversine. Candidates are linear in true neighbor density — never an
  * all-pairs cross join.
  *
  * Coordinates are synthesized deterministically from customer keys
  * (integer mod then one exact int->double + division — identical in
  * both engines); haversine is ONE shared IEEE tree whose libm ulp drift
  * (sin/cos/asin differ across runtimes) is absorbed by round-6, the
  * q_entropy ln argument.
  */
object Geo {

  /** Deterministic synthetic points in lat [40, 50) x lon [0, 20). */
  def syntheticPoints(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir).select(
      col("c_custkey").as("id"),
      (((col("c_custkey") * 37) % 1000).cast("double") / 100.0 + 40.0).as("lat"),
      (((col("c_custkey") * 73) % 2000).cast("double") / 100.0).as("lon"))

  /** Haversine great-circle distance in km: the standard
    * 2R·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2))) as one shared
    * expression tree (R = 6371.0).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** q_geo_distance: every point's distance to a fixed hub (45N, 10E) —
    * the scalar geo verb (store-to-customer distance, geofencing).
    * Pure map-side column math, round-6.
    */
  def geoDistance(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    syntheticPoints(spark, dir)
      .select(col("id"),
        r6(haversineKm(col("lat"), col("lon"), lit(45.0), lit(10.0))).as("hub_km"))
      .orderBy(col("id"))
  }

  /** q_geo_join: for each PROBE point (a FIXED ~150-point query set:
    * id % 20 = 0 and id <= 3000), its neighbors within 150 km — via the
    * 2-degree-cell 5x3 neighborhood equi-join, exact haversine verify on
    * the ROUNDED distance (the boundary cannot flip), then a per-probe
    * rollup: neighbor count and the nearest neighbor by (rounded km,
    * id).
    *
    * Neighborhood completeness (round 9 fix): 2 deg of LATITUDE is
    * ~222 km >= 150 km, so dy in -1..1 covers latitude. LONGITUDE
    * degrees shrink with cos(lat): at this dataset's upper edge
    * (lat -> 50), 1 deg lon ~= 111.32*cos(50 deg) ~= 71.6 km, so 150 km
    * spans up to ~2.1 deg of lon — two 2-deg cells apart (e.g. lons
    * 1.999 and 4.049 sit in cells 0 and 2 yet are within 150 km at lat
    * ~50). Hence dx in -2..2: floor-cell distance <= ceil(2.1/2) = 2 is
    * fully covered. The round-8 3x3 form silently dropped those
    * cross-two-cell pairs (both engines shared the bug, so the oracle
    * gate could not see it; the brute-force GeoSpec check at sf0.01
    * catches it now).
    *
    * Scale: the probe set is corpus-size-INDEPENDENT (the geo-
    * service framing — query points are given, the corpus grows), so
    * candidate work = |probes| x cell density — linear in the corpus.
    * A probe side that grew with the corpus would be quadratic in a
    * fixed region (first cut measured 124 s at sf1 exactly that way).
    */
  def geoJoin(spark: SparkSession, dir: String): DataFrame =
    geoJoinOn(syntheticPoints(spark, dir))

  /** The cell join on any (id, lat, lon) frame — split out so the
    * completeness of the neighborhood is unit-testable on adversarial
    * hand-made points (the cross-two-cell pair at high latitude).
    */
  def geoJoinOn(points: DataFrame): DataFrame = {
    import graft.Det.r6
    val pts = points
      .withColumn("cx", floor(col("lon") / 2.0).cast("long"))
      .withColumn("cy", floor(col("lat") / 2.0).cast("long"))
    val probes = pts.filter(col("id") % 20 === 0 && col("id") <= 3000)
      .select(col("id").as("a"), col("lat").as("alat"), col("lon").as("alon"),
              col("cx"), col("cy"))
      // 5x3 neighborhood: the probe side replicates 15x (probes are the
      // small side), the corpus joins once on its own cell
      .withColumn("dx", explode(array(lit(-2L), lit(-1L), lit(0L), lit(1L), lit(2L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("a"), col("alat"), col("alon"),
              (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val cand = probes.join(pts.select(col("id").as("b"), col("lat").as("blat"),
                                      col("lon").as("blon"), col("cx"), col("cy")),
                           Seq("cx", "cy"))
      .filter(col("a") =!= col("b"))
      .withColumn("km", r6(haversineKm(col("alat"), col("alon"), col("blat"), col("blon"))))
      .filter(col("km") <= 150.0)
    // nearest by (rounded km, id) via the same window both engines run
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("km"), col("b"))
    cand
      .withColumn("rn", row_number().over(w))
      .withColumn("n_neighbors", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("a"))))
      .filter(col("rn") === 1)
      .select(col("a"), col("n_neighbors"),
              col("b").as("nearest_id"), col("km").as("nearest_km"))
      .orderBy(col("a"))
  }

  /** q_geo_grid: 1°×1° density grid — point count, Σid membership pin
    * and the cell centroid per cell: the choropleth/heat-map prep every
    * location product computes, and the aggregation grain spatial
    * rollups partition by at 100 TB (cells are equi-join keys; the
    * grid IS the shuffle key, so density work is one hash aggregate,
    * never geometry). Cell ids are floor(lat)/floor(lon) of the exact
    * synthetic rationals (k/100 + 40 — representable doubles whose
    * floor cannot straddle engines, including the exact-integer
    * boundary values); centroids are cross-row double means absorbed by
    * round-6 (the q_entropy argument).
    */
  def geoGrid(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    syntheticPoints(spark, dir)
      .select(col("id"), col("lat"), col("lon"),
        floor(col("lat")).cast("long").as("cell_lat"),
        floor(col("lon")).cast("long").as("cell_lon"))
      .groupBy(col("cell_lat"), col("cell_lon"))
      .agg(count(lit(1)).as("n_points"), sum(col("id")).as("sum_id"),
           r6(sum(col("lat")) / count(lit(1)).cast("double")).as("centroid_lat"),
           r6(sum(col("lon")) / count(lit(1)).cast("double")).as("centroid_lon"))
      .orderBy(col("cell_lat"), col("cell_lon"))
  }
}
