package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GroupFiles

/** CALL system.rewrite_zorder — the OPTIMIZE ZORDER BY analogue: after
  * the rewrite, per-group min/max stats prune range scans on EITHER
  * z-ordered column, which a single-column sort can only do for one.
  */
class ZorderRewriteSpec extends AnyFunSuite with SparkFixture {

  private val T = "graft_zo.default.zo_t"

  private def dir() = {
    val cat = spark.sessionState.catalogManager.catalog("graft_zo")
      .asInstanceOf[graft.catalog.GraftCatalog]
    Paths.get(cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("default"), "zo_t")).asInstanceOf[graft.catalog.GraftTable].location)
  }

  /** Share of live groups whose [min,max] stat range on `c` intersects
    * the query range — the manifest-level measure of scan pruning.
    */
  private def touchShare(c: String, lo: Long, hi: Long): Double = {
    val gs = GroupFiles.live(dir())
    val touched = gs.count(g => g.stats.get(c) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true // no stats = cannot prune
    })
    touched.toDouble / gs.size
  }

  test("zorder rewrite: row set preserved; range scans on BOTH dims prune groups") {
    spark.conf.set("spark.sql.catalog.graft_zo", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (x BIGINT, y BIGINT, payload STRING)")
    // 4 inserts in x-major order: every group spans the FULL y range and
    // a quarter of x — y-range queries can prune nothing
    (0 until 4).foreach { q =>
      val rows = (0 until 1024).map { i =>
        val x = q * 256 + (i % 256); val y = (i * 37) % 1024
        s"($x, $y, 'p$x-$y')"
      }.mkString(", ")
      spark.sql(s"INSERT INTO $T VALUES $rows")
    }
    val beforeRows = spark.sql(s"SELECT * FROM $T").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val yShareBefore = touchShare("y", 0, 63)
    assert(yShareBefore === 1.0, "pre-rewrite, every group spans the full y range")

    val res = spark.sql(
      s"CALL graft_zo.system.rewrite_zorder('default.zo_t', 'x', 'y', 16)").collect()(0)
    assert(res.getLong(2) === 4096L)
    assert(res.getLong(1) >= 8, s"expected >= 8 groups after, got ${res.getLong(1)}")

    // content is preserved exactly
    val afterRows = spark.sql(s"SELECT * FROM $T").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(afterRows === beforeRows)

    // BOTH dimensions now prune: a 1/16-wide range on either column
    // touches a strict minority of groups
    val xShare = touchShare("x", 0, 63)
    val yShare = touchShare("y", 0, 63)
    assert(xShare <= 0.5, s"x-range touches $xShare of groups")
    assert(yShare <= 0.5, s"y-range touches $yShare of groups")

    // and the catalog scan actually returns the right rows post-rewrite
    assert(spark.sql(s"SELECT COUNT(*) FROM $T WHERE y BETWEEN 0 AND 63")
      .collect()(0).getLong(0) === beforeRows.count(r => r._2 <= 63))
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("bare one-part table name resolves like every other procedure") {
    spark.conf.set("spark.sql.catalog.graft_zo", "graft.catalog.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_zo.default.zo_bare")
    spark.sql("CREATE TABLE graft_zo.default.zo_bare (x BIGINT, y BIGINT)")
    spark.sql("INSERT INTO graft_zo.default.zo_bare VALUES (1, 2), (3, 4)")
    val res = spark.sql(
      "CALL graft_zo.system.rewrite_zorder('zo_bare', 'x', 'y', 1)").collect()(0)
    assert(res.getLong(2) === 2L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_zo.default.zo_bare")
      .collect()(0).getLong(0) === 2)
    spark.sql("DROP TABLE IF EXISTS graft_zo.default.zo_bare")
  }
}
