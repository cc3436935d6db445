package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Merge

class MergeSpec extends AnyFunSuite with SparkFixture {

  private def customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("upsert: updated keys take stage values, others untouched, new keys added") {
    val stage = customer.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val merged = Merge.upsert(customer, stage, Seq("c_custkey"))
    assert(merged.count() === customer.count())
    val before = customer.filter(col("c_custkey") === 10).select("c_acctbal").head.getDouble(0)
    val after = merged.filter(col("c_custkey") === 10).select("c_acctbal").head.getDouble(0)
    assert(math.abs(after - before - 100.0) < 1e-9)
  }

  test("upsert is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    val stage = customer.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", lit(42.0))
    val once = Merge.upsert(customer, stage, Seq("c_custkey"))
    val twice = Merge.upsert(once, stage, Seq("c_custkey"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("insertMissing never overwrites and only adds absent keys") {
    val stage = customer.limit(50)
      .withColumn("c_acctbal", lit(-999.0)) // would be visible if overwritten
    val res = Merge.insertMissing(customer, stage, Seq("c_custkey"))
    assert(res.count() === customer.count())
    assert(res.filter(col("c_acctbal") === -999.0).count() === 0)
    val newRows = stage.withColumn("c_custkey", col("c_custkey") + 5000000)
    val res2 = Merge.insertMissing(customer, newRows, Seq("c_custkey"))
    assert(res2.count() === customer.count() + 50)
  }

  test("deleteByKeys removes all rows matching the (composite) key set") {
    // NB: (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // DELETE semantics are "drop every row matching a staged key".
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val keys = l.filter(col("l_suppkey") % 13 === 0).select("l_orderkey", "l_linenumber")
    val res = Merge.deleteByKeys(l, keys, Seq("l_orderkey", "l_linenumber"))
    val matching = l.join(keys.distinct(), Seq("l_orderkey", "l_linenumber"), "left_semi").count()
    assert(res.count() === l.count() - matching)
    assert(res.join(keys, Seq("l_orderkey", "l_linenumber"), "inner").count() === 0)
  }

  test("delete then re-insert restores the table (unique-PK table)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val victims = o.filter(col("o_orderkey") % 13 === 0)
    val deleted = Merge.deleteByKeys(o, victims.select("o_orderkey"), Seq("o_orderkey"))
    val restored = Merge.insertMissing(deleted, victims, Seq("o_orderkey"))
    assert(restored.exceptAll(o).isEmpty && o.exceptAll(restored).isEmpty)
  }

  test("upsert: matched stage row overwrites wholesale, including NULLs (DO-UPDATE semantics)") {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L)).toDF("k", "v", "x")
    val stage = Seq((1L, Option.empty[String], 99L), (3L, Option("c"), 30L)).toDF("k", "v", "x")
    val out = Merge.upsert(target, stage, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) null else r.getString(1)) -> r.getLong(2))).toMap
    assert(out(1L) === ((null: String) -> 99L))   // stage NULL replaces target value
    assert(out(2L) === ("b" -> 20L))      // unmatched target survives
    assert(out(3L) === ("c" -> 30L))      // stage-only row inserted
  }


  test("scd2: intervals chain per key; exactly one current row per key") {
    val rows = graft.ops.Merge.scd2Query(spark, sfDir).collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, rs) =>
      assert(rs.count(_.getBoolean(4)) === 1, s"key $k: exactly one is_current")
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(1)))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(!a.isNullAt(3) && a.getLong(3) === b.getLong(2), s"key $k: valid_to chains to next valid_from")
      }
    }
  }

  test("join PIT: the picked version is the latest at-or-before each fact; own order qualifies") {
    import org.apache.spark.sql.functions._
    val res = graft.ops.Merge.joinPit(spark, sfDir).collect()
    assert(res.nonEmpty)
    val orders = graft.io.Sources.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = orders.groupBy(_._2)
    var nulls = 0
    res.foreach { r =>
      val (ck, shipUs) = (r.getLong(2), r.getLong(3))
      val eligible = byCust(ck).filter(_._3 <= shipUs)
      if (eligible.isEmpty) {
        // synthetic ship dates are drawn independently of order dates, so
        // a fact can predate every version — "no version in effect yet"
        // must surface as NULL, never as a later version leaking backward
        assert(r.isNullAt(4), s"cust $ck at $shipUs: no eligible version, pit must be NULL")
        nulls += 1
      } else {
        val maxUs = eligible.map(_._3).max
        val expect = eligible.filter(_._3 == maxUs).map(_._1).max
        assert(r.getLong(4) === expect, s"cust $ck at $shipUs: pit ${r.getLong(4)} vs $expect")
      }
    }
    assert(nulls > 0, "this dataset contains pre-version facts — the NULL path must be exercised")
    // row count conserves lineitems
    assert(res.length.toLong === graft.io.Sources.lineitem(spark, sfDir).count())
  }

  test("q_incremental_view: chained change-feed refreshes equal a full build at the final version") {
    import org.apache.spark.sql.functions.col
    val declared = graft.ops.Merge.incrementalViewQuery(spark, sfDir)
    val full = graft.catalog.IncrementalView
      .build(spark, "graft_ivmq.default.orders_ivm", Seq("pri"), Seq("cents"))
      .select(col("pri").as("o_orderpriority"), col("__n").as("n"),
              col("__nn_cents").as("n_price"), col("__sum_cents").as("sum_cents"))
    assert(declared.exceptAll(full).isEmpty && full.exceptAll(declared).isEmpty)
    val rows = declared.collect()
    assert(rows.nonEmpty)
    // the nullable measure really is exercised: some rows lack the price
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)),
      "expected NULL-measure rows so the __nn bookkeeping is load-bearing")
  }
}
