package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scale

class ScaleSpec extends AnyFunSuite with SparkFixture {

  test("bucketed join of two co-bucketed tables plans NO shuffle") {
    import graft.io.Sources
    Scale.writeBucketed(Sources.orders(spark, sfDir), "b_orders",
      Seq("o_custkey"), 4, Seq("o_custkey"))
    Scale.writeBucketed(Sources.customer(spark, sfDir), "b_customer",
      Seq("c_custkey"), 4, Seq("c_custkey"))
    // disable broadcast so the planner actually exercises the buckets
    // (with a broadcastable side it rightly prefers BroadcastHashJoin)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val p = plan(j)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(j.count() === Sources.orders(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("salted join returns the same rows as the plain join") {
    import spark.implicits._
    // hot key: 90% of the large side is key 7
    val large = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong % 20 else 7L, i)).toDF("k", "v")
    val small = (0L to 19L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, "k")
    val salted = Scale.saltedJoinBy(large, small, "k", col("v"), 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val large = (1 to 1000).map(i => (7L, i)).toDF("k", "v")
    val buckets = large.withColumn("__salt", pmod(xxhash64(col("v")), lit(8)))
      .groupBy("__salt").count().collect()
    assert(buckets.length === 8, "all salt buckets should be populated")
    assert(buckets.map(_.getLong(1)).max < 1000 / 2, "no bucket holds most of the hot key")
  }

  test("sampleByHash: deterministic, referentially consistent across tables") {
    import graft.io.Sources
    val o1 = Scale.sampleByHash(Sources.orders(spark, sfDir), "o_orderkey", 0.2)
    val o2 = Scale.sampleByHash(Sources.orders(spark, sfDir), "o_orderkey", 0.2)
    assert(o1.exceptAll(o2).isEmpty, "same fraction+key ⇒ identical sample")
    val n = o1.count().toDouble / Sources.orders(spark, sfDir).count()
    assert(n > 0.1 && n < 0.3, s"sampled fraction $n far from 0.2")
    // referential consistency: lineitem sampled on the SAME key joins fully
    val l = Scale.sampleByHash(
      Sources.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey", 0.2)
    assert(l.join(o1, "o_orderkey").count() === l.count())
  }

  test("coPartition: downstream groupBy on the key reuses the partitioning") {
    val co = Scale.coPartition(graft.io.Sources.orders(spark, sfDir), "o_custkey", 4)
    val agg = co.groupBy("o_custkey").agg(count(lit(1)))
    // exactly one exchange: the explicit repartition; the aggregate reuses it
    val p = plan(agg)
    val exchanges = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges === 1, s"aggregate should reuse the co-partitioning:\n$p")
  }
}
