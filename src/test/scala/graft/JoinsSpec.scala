package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Joins
import graft.io.Sources

class JoinsSpec extends AnyFunSuite with SparkFixture {

  test("broadcast join actually plans a BroadcastHashJoin") {
    val p = plan(Joins.joinBroadcast(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in plan:\n$p")
  }

  test("merge-hinted join actually plans a SortMergeJoin") {
    val p = plan(Joins.joinSortMerge(spark, sfDir))
    assert(p.contains("SortMergeJoin"), s"no sort-merge in plan:\n$p")
  }

  test("inner join: every segment accounted; order counts sum to orders") {
    val rows = Joins.joinInner(spark, sfDir).collect()
    val totalOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum === totalOrders)
  }

  test("left join keeps all customers") {
    assert(Joins.joinLeft(spark, sfDir).count() ===
      spark.read.parquet(s"$sfDir/customer.parquet").count())
  }

  test("full outer covers the union of nation keys") {
    val nk = Joins.joinFull(spark, sfDir).collect().map(_.getLong(0)).toSet
    val cnk = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey").distinct().collect().map(_.getInt(0).toLong).toSet
    val snk = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_nationkey").distinct().collect().map(_.getInt(0).toLong).toSet
    assert(nk === (cnk ++ snk))
  }

  test("semi ∪ anti partitions nothing; semi ⊆ customers with orders") {
    val semi = Joins.joinSemi(spark, sfDir).collect().map(_.getLong(0)).toSet
    val withOrders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(semi.subsetOf(withOrders))
  }

  test("anti join = customers minus customers-with-orders") {
    val anti = Joins.joinAnti(spark, sfDir).collect().map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val withOrders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(anti === all.diff(withOrders))
  }

  test("cross join cardinality = |region| × |nation|") {
    assert(Joins.joinCross(spark, sfDir).count() === 5L * 25L)
  }

  test("range self-join: per-customer pair count ≤ n·(n−1)/2") {
    val pairs = Joins.joinRange(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (ck, n) =>
      val c = perCust(ck)
      assert(n <= c * (c - 1) / 2, s"customer $ck: $n pairs from $c orders")
    }
  }

  test("null-safe join: NULL keys match; count equals sum over nation buckets") {
    import org.apache.spark.sql.functions._
    val c = Sources.customer(spark, sfDir)
      .groupBy(nullif(col("c_nationkey"), lit(13)).as("k")).agg(count(lit(1)).as("nc"))
    val s = Sources.supplier(spark, sfDir)
      .groupBy(nullif(col("s_nationkey"), lit(13)).as("k")).agg(count(lit(1)).as("ns"))
    val expected = c.join(s, c("k") <=> s("k"))
      .agg(sum(col("nc") * col("ns"))).collect()(0).getLong(0)
    val actual = Joins.joinNullSafe(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(actual === expected)
  }

}
