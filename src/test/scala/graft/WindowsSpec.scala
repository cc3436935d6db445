package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Windows

class WindowsSpec extends AnyFunSuite with SparkFixture {

  test("rank: rn is a permutation within each segment; rnk ≤ rn") {
    val rows = Windows.windowRank(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getString(1))
    bySeg.foreach { case (_, rs) =>
      val rns = rs.map(_.getLong(rs.head.fieldIndex("rn"))).sorted
      assert(rns === (1L to rs.length).toArray.toSeq)
      assert(rs.forall(r => r.getLong(r.fieldIndex("rnk")) <= r.getLong(r.fieldIndex("rn"))))
    }
  }

  test("running sum: last value per customer equals customer total") {
    val rows = Windows.windowRunning(spark, sfDir).collect()
    // run_sum is non-decreasing only if prices are positive — check the
    // stronger invariant: max(run_sum) per cust == exact decimal total.
    val byCust = rows.groupBy(_.getLong(1))
    import graft.Det.money
    import org.apache.spark.sql.functions._
    val totals = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey")).agg(sum(money(col("o_totalprice"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    byCust.foreach { case (ck, rs) =>
      val last = rs.map(_.getDouble(2)).max
      assert(last === totals(ck).doubleValue, s"customer $ck")
    }
  }

  test("range frame: trailing-30d count ≥ 1 (self included)") {
    val rows = Windows.windowRange(spark, sfDir).collect()
    assert(rows.forall(_.getLong(3) >= 1))
  }

  test("lag/lead: first event per user has null delta") {
    val rows = Windows.windowLagLead(spark, sfDir).collect()
    val firstPerUser = rows.groupBy(_.getLong(1)).map { case (_, rs) => rs.minBy(_.getLong(0)) }
    assert(rows.exists(_.isNullAt(2)))
    val nUsers = rows.map(_.getLong(1)).distinct.length
    assert(rows.count(_.isNullAt(2)) === nUsers)
  }

  test("first/last/nth: single-order customers have first==last, null second") {
    val rows = Windows.windowFirstLast(spark, sfDir).collect()
    val byCust = rows.groupBy(_.getLong(1))
    byCust.foreach { case (ck, rs) =>
      // first_price / last_price are partition constants except that
      // first_value's running frame means every row's first is the true
      // first; last over the full frame is constant
      val lasts = rs.map(_.getDouble(3)).distinct
      assert(lasts.length === 1, s"customer $ck: last_price must be one value per partition")
      if (rs.length == 1) {
        assert(rs.head.getDouble(2) === rs.head.getDouble(3), s"customer $ck")
        assert(rs.head.isNullAt(4), s"customer $ck: nth(2) of a 1-row partition is null")
      } else {
        assert(rs.forall(!_.isNullAt(4)), s"customer $ck: nth(2) defined for 2+ orders")
      }
    }
  }

  test("top-k per group: at most 3 per segment, ranked 1..k") {
    val rows = Windows.topkPerGroup(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(3)).sorted === (1L to rs.length).toSeq)
    }
  }

  test("sort+limit: exactly 100 rows, descending prices") {
    val prices = Windows.sortLimitTopk(spark, sfDir).collect().map(_.getDouble(1))
    assert(prices.length === 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("set algebra: intersect ∪ except = all customer keys, disjoint") {
    val inter = Windows.intersectKeys(spark, sfDir).collect().map(_.getLong(0)).toSet
    val exc = Windows.exceptKeys(spark, sfDir).collect().map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(inter.intersect(exc).isEmpty)
    assert(inter ++ exc === all)
  }

  test("union all counts = customer appearances + order appearances") {
    val n = Windows.unionAll(spark, sfDir).collect().map(_.getLong(1)).sum
    val c = spark.read.parquet(s"$sfDir/customer.parquet").count()
    val o = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(n === c + o)
  }

  test("union distinct is deduplicated") {
    val keys = Windows.unionDistinct(spark, sfDir).collect().map(_.getLong(0))
    assert(keys.length === keys.distinct.length)
  }

  test("ntile: quartile in 1..4; pr and cd in [0,1]; cd non-decreasing with pr") {
    val rows = Windows.windowNtile(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 4))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) >= r.getDouble(3)))
  }

  test("except all / intersect all: multiplicities equal the bag arithmetic") {
    import org.apache.spark.sql.functions.col
    val li = graft.io.Sources.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ca = li.filter(_._1 % 2 == 1).groupBy(_._2).map { case (s, xs) => s -> xs.length }
    val cb = li.filter(_._1 % 3 == 0).groupBy(_._2).map { case (s, xs) => s -> xs.length }
    val keys = (ca.keySet ++ cb.keySet)
    val wantEx = keys.map(k => k -> math.max(ca.getOrElse(k, 0) - cb.getOrElse(k, 0), 0))
      .filter(_._2 > 0).toMap
    val wantIn = keys.map(k => k -> math.min(ca.getOrElse(k, 0), cb.getOrElse(k, 0)))
      .filter(_._2 > 0).toMap
    val gotEx = graft.ops.Windows.exceptAllKeys(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val gotIn = graft.ops.Windows.intersectAllKeys(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(gotEx == wantEx, "EXCEPT ALL multiplicities")
    assert(gotIn == wantIn, "INTERSECT ALL multiplicities")
  }
}
