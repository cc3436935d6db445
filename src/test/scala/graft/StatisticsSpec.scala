package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Statistics
import graft.io.Sources

class StatisticsSpec extends AnyFunSuite with SparkFixture {

  test("tableStats: one row per column; exact facts hold on customer") {
    val c = Sources.customer(spark, sfDir)
    val stats = Statistics.tableStats(c).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(stats.size === c.columns.length)
    val (nulls, ndv, mn, mx) = stats("c_custkey")
    assert(nulls === 0L)
    val exact = c.count()
    assert(math.abs(ndv - exact).toDouble / exact < 0.15)   // HLL tolerance
    val r = c.agg(org.apache.spark.sql.functions.min("c_custkey"),
                  org.apache.spark.sql.functions.max("c_custkey")).collect()(0)
    assert(mn === r.getLong(0).toString && mx === r.getLong(1).toString)
  }

  test("tableStats runs as a single job over all columns") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Statistics.tableStats(Sources.nation(spark, sfDir)).collect()
    // one agg pass + small fixed overhead — NOT one job per column
    // (nation has 4 columns; a per-column implementation would need 8+)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 4, s"too many jobs: ${after - before}")
  }
}
