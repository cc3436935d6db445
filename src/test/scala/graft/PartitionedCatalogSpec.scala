package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{GraftPartitionTransforms, GroupFiles}

/** Value-partitioned catalog tables (`PARTITIONED BY (col)` / `(days(ts))`
  * / `(months(ts))`): write-side row routing into per-partition group
  * files, manifest #p tags, and the payoff — a time-range query's scan
  * plans ONLY the in-range groups (manifest-stat pruning made exact by
  * the per-partition layout), the catalog analogue of hive partition
  * pruning (q_partition_prune's parquet-side twin).
  */
class PartitionedCatalogSpec extends AnyFunSuite with SparkFixture {

  private def tableDir(cat: String, name: String) = {
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.catalog.GraftCatalog]
    val t = c.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("default"), name)).asInstanceOf[graft.catalog.GraftTable]
    Paths.get(t.location)
  }

  private def setup(): Unit =
    spark.conf.set("spark.sql.catalog.graft_pt", "graft.catalog.GraftCatalog")

  test("days(ts): writes route to per-day groups; time-range scan opens only in-range groups") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_days")
    spark.sql("""CREATE TABLE graft_pt.default.pt_days (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    // 8 days × 50 rows (hourly-ish spread within each day)
    spark.sql("""INSERT INTO graft_pt.default.pt_days
                 SELECT timestamp_ntz'2024-03-01 00:00:00'
                          + make_interval(0, 0, 0, CAST(id / 50 AS INT), CAST(id % 24 AS INT), 0, 0) AS ts,
                        id AS v
                 FROM range(400)""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_days"))
    assert(live.nonEmpty)
    assert(live.forall(_.part.isDefined), "every group must carry a #p partition tag")
    // the distinct partition values are exactly the 8 inserted epoch-days
    val day0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay
    assert(live.flatMap(_.part).map(_.toLong).toSet ===
      (day0 until day0 + 8).toSet)
    // each group's ts stats live inside its tagged day — the invariant
    // that makes a day-range predicate prune exactly
    live.foreach { g =>
      val d = g.part.get.toLong
      val (lo, hi) = g.stats("ts")
      assert(Math.floorDiv(lo, GraftPartitionTransforms.MICROS_PER_DAY) === d &&
             Math.floorDiv(hi, GraftPartitionTransforms.MICROS_PER_DAY) === d,
        s"group ${g.file} tagged day $d has ts range outside it")
    }
    // full read back
    assert(spark.table("graft_pt.default.pt_days").count() === 400)
    // PLAN-GATE: a 2-day range query must plan only the 2 in-range groups
    val twoDays = spark.sql(
      """SELECT * FROM graft_pt.default.pt_days
        |WHERE ts >= timestamp_ntz'2024-03-03 00:00:00'
        |  AND ts <  timestamp_ntz'2024-03-05 00:00:00'""".stripMargin)
    val inRange = live.count(g =>
      g.part.get.toLong >= day0 + 2 && g.part.get.toLong <= day0 + 3)
    assert(twoDays.rdd.getNumPartitions === inRange,
      s"expected $inRange in-range groups planned, got ${twoDays.rdd.getNumPartitions}")
    assert(twoDays.count() === 100)
    // a range before all data prunes everything and still answers
    assert(spark.sql(
      """SELECT * FROM graft_pt.default.pt_days
        |WHERE ts < timestamp_ntz'2024-01-01 00:00:00'""".stripMargin).count() === 0)
    spark.sql("DROP TABLE graft_pt.default.pt_days")
  }

  test("identity partitioning on BIGINT routes per value and prunes equality scans") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_id")
    spark.sql("""CREATE TABLE graft_pt.default.pt_id (region_id BIGINT, v STRING)
                 PARTITIONED BY (region_id)""")
    spark.sql("""INSERT INTO graft_pt.default.pt_id
                 SELECT pmod(id, 5) AS region_id, CAST(id AS STRING) AS v
                 FROM range(200)""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_id"))
    assert(live.flatMap(_.part).map(_.toLong).toSet === Set(0L, 1L, 2L, 3L, 4L))
    // identity layout: each group holds exactly one region value
    live.foreach { g =>
      val (lo, hi) = g.stats("region_id")
      assert(lo === hi && lo === g.part.get.toLong)
    }
    val one = spark.sql("SELECT * FROM graft_pt.default.pt_id WHERE region_id = 3")
    val rg3 = live.count(_.part.contains("3"))
    assert(one.rdd.getNumPartitions === rg3,
      s"expected $rg3 groups for region 3, got ${one.rdd.getNumPartitions}")
    assert(one.count() === 40)
    spark.sql("DROP TABLE graft_pt.default.pt_id")
  }

  test("months(ts) partition values are month indexes since 1970") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_months")
    spark.sql("""CREATE TABLE graft_pt.default.pt_months (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (months(ts))""")
    spark.sql("""INSERT INTO graft_pt.default.pt_months VALUES
                 (timestamp_ntz'2023-12-31 23:59:59', 1),
                 (timestamp_ntz'2024-01-01 00:00:00', 2),
                 (timestamp_ntz'2024-02-29 12:00:00', 3)""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_months"))
    // 2023-12 = (2023-1970)*12 + 11 = 647; 2024-01 = 648; 2024-02 = 649
    assert(live.flatMap(_.part).map(_.toLong).toSet === Set(647L, 648L, 649L))
    assert(spark.table("graft_pt.default.pt_months").count() === 3)
    spark.sql("DROP TABLE graft_pt.default.pt_months")
  }

  test("NULL partition column routes to the null partition and reads back") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_null")
    spark.sql("""CREATE TABLE graft_pt.default.pt_null (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft_pt.default.pt_null VALUES
                 (timestamp_ntz'2024-05-01 08:00:00', 1),
                 (CAST(NULL AS TIMESTAMP_NTZ), 2)""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_null"))
    assert(live.flatMap(_.part).toSet.contains("null"))
    val rows = spark.table("graft_pt.default.pt_null").collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(0)) === 1)
    spark.sql("DROP TABLE graft_pt.default.pt_null")
  }

  test("partition layout survives MERGE (delta inserts route) and rename; guards hold") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_merge")
    spark.sql("""CREATE TABLE graft_pt.default.pt_merge (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft_pt.default.pt_merge VALUES
                 (timestamp_ntz'2024-06-01 01:00:00', 1),
                 (timestamp_ntz'2024-06-02 01:00:00', 2)""")
    spark.sql("""MERGE INTO graft_pt.default.pt_merge t
                 USING (SELECT timestamp_ntz'2024-06-03 05:00:00' AS ts, 30 AS v) s
                 ON t.v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_merge"))
    assert(live.forall(_.part.isDefined),
      "groups appended by MERGE must carry partition tags too")
    assert(live.flatMap(_.part).map(_.toLong).toSet.size === 3)
    // rename follows the layout column
    spark.sql("ALTER TABLE graft_pt.default.pt_merge RENAME COLUMN ts TO event_ts")
    assert(spark.sql(
      "SELECT * FROM graft_pt.default.pt_merge WHERE event_ts >= timestamp_ntz'2024-06-03 00:00:00'")
      .count() === 1)
    // the partition column cannot be dropped; an evolution that leaves the
    // days transform pointing at a BIGINT column must fail loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_pt.default.pt_merge DROP COLUMN event_ts") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_pt.default.pt_merge SET TBLPROPERTIES('partition_by'='v')") }
    spark.sql("DROP TABLE graft_pt.default.pt_merge")
  }

  test("partition evolution: days -> months; old files keep their layout, new writes re-route") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_evolve")
    spark.sql("""CREATE TABLE graft_pt.default.pt_evolve (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft_pt.default.pt_evolve VALUES
                 (timestamp_ntz'2024-03-01 01:00:00', 1),
                 (timestamp_ntz'2024-03-02 01:00:00', 2),
                 (timestamp_ntz'2024-03-03 01:00:00', 3)""")
    spark.sql("""ALTER TABLE graft_pt.default.pt_evolve
                 SET TBLPROPERTIES('partition_transform'='months')""")
    spark.sql("""INSERT INTO graft_pt.default.pt_evolve VALUES
                 (timestamp_ntz'2024-04-05 01:00:00', 4),
                 (timestamp_ntz'2024-04-20 01:00:00', 5),
                 (timestamp_ntz'2024-05-07 01:00:00', 6)""")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_evolve"))
    val (newG, oldG) = live.partition(_.part.exists(_.contains(".")))
    // spec-0 groups keep their bare epoch-day tags
    val day0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay
    assert(oldG.nonEmpty && oldG.flatMap(_.part).map(_.toLong).toSet ===
      (day0 until day0 + 3).toSet)
    // spec-1 groups are month-routed and seq-tagged: 2024-04 = 651, 2024-05 = 652
    assert(newG.nonEmpty && newG.flatMap(_.part).toSet === Set("1.651", "1.652"))
    // both generations read back together
    assert(spark.table("graft_pt.default.pt_evolve").count() === 6)
    assert(spark.sql(
      "SELECT CAST(SUM(v) AS BIGINT) s FROM graft_pt.default.pt_evolve").collect()(0).getLong(0) === 21)
    // pruning stays exact on BOTH generations (stats-driven, not layout-
    // driven): an April range opens only the April group, a March-day
    // range only that day's group
    val april = spark.sql(
      """SELECT * FROM graft_pt.default.pt_evolve
        |WHERE ts >= timestamp_ntz'2024-04-01 00:00:00'
        |  AND ts <  timestamp_ntz'2024-05-01 00:00:00'""".stripMargin)
    assert(april.rdd.getNumPartitions === 1 && april.count() === 2)
    val march2 = spark.sql(
      """SELECT * FROM graft_pt.default.pt_evolve
        |WHERE ts >= timestamp_ntz'2024-03-02 00:00:00'
        |  AND ts <  timestamp_ntz'2024-03-03 00:00:00'""".stripMargin)
    assert(march2.rdd.getNumPartitions === 1 && march2.count() === 1)
    // DESCRIBE reports the CURRENT spec
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_pt.default.pt_evolve")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("months"))
    spark.sql("DROP TABLE graft_pt.default.pt_evolve")
  }

  test("partition evolution: a plain table gains a layout; UNSET removes it for future writes") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_gain")
    spark.sql("CREATE TABLE graft_pt.default.pt_gain (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_pt.default.pt_gain VALUES (1, 'a'), (2, 'b')")
    spark.sql("""ALTER TABLE graft_pt.default.pt_gain
                 SET TBLPROPERTIES('partition_by'='k')""")
    spark.sql("INSERT INTO graft_pt.default.pt_gain VALUES (1, 'c'), (3, 'd')")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_gain"))
    val (tagged, untagged) = live.partition(_.part.isDefined)
    assert(untagged.nonEmpty, "pre-evolution groups carry no partition tag")
    assert(tagged.flatMap(_.part).toSet === Set("1.1", "1.3"))
    assert(spark.table("graft_pt.default.pt_gain").count() === 4)
    // drop the layout again: spec bumps, future writes stop routing
    spark.sql("""ALTER TABLE graft_pt.default.pt_gain
                 UNSET TBLPROPERTIES('partition_by')""")
    spark.sql("INSERT INTO graft_pt.default.pt_gain VALUES (9, 'e')")
    val after = GroupFiles.live(tableDir("graft_pt", "pt_gain"))
    assert(after.size === live.size + 1)
    assert(after.count(_.part.isEmpty) === untagged.size + 1)
    assert(spark.table("graft_pt.default.pt_gain").count() === 5)
    spark.sql("DROP TABLE graft_pt.default.pt_gain")
  }

  test("idempotent layout re-apply does not mint a new spec (compaction bins stay mergeable)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_noop")
    spark.sql("""CREATE TABLE graft_pt.default.pt_noop (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    spark.sql("INSERT INTO graft_pt.default.pt_noop VALUES (timestamp_ntz'2024-09-01 01:00:00', 1)")
    // a deployment script re-applying the identical layout
    spark.sql("""ALTER TABLE graft_pt.default.pt_noop
                 SET TBLPROPERTIES('partition_by'='ts','partition_transform'='days')""")
    spark.sql("INSERT INTO graft_pt.default.pt_noop VALUES (timestamp_ntz'2024-09-01 02:00:00', 2)")
    val live = GroupFiles.live(tableDir("graft_pt", "pt_noop"))
    // both groups carry the SAME bare spec-0 tag -> one compaction bin
    assert(live.flatMap(_.part).toSet.size === 1)
    assert(live.flatMap(_.part).forall(!_.contains(".")), "no spec prefix on a no-op re-apply")
    spark.sql("CALL graft_pt.system.compact('default.pt_noop', 64)")
    assert(GroupFiles.live(tableDir("graft_pt", "pt_noop")).size === 1)
    spark.sql("DROP TABLE graft_pt.default.pt_noop")
  }

  test("partition evolution guards: dangling transform, bucketed tables, bucket props") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_guard")
    spark.sql("CREATE TABLE graft_pt.default.pt_guard (k BIGINT, v STRING)")
    // transform without a column is a dangling layout
    intercept[Exception] {
      spark.sql("""ALTER TABLE graft_pt.default.pt_guard
                   SET TBLPROPERTIES('partition_transform'='days')""") }
    // bucket layout stays immutable either way
    intercept[Exception] {
      spark.sql("""ALTER TABLE graft_pt.default.pt_guard
                   SET TBLPROPERTIES('bucket_by'='k','buckets'='4')""") }
    spark.sql("DROP TABLE graft_pt.default.pt_guard")
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_guard_b")
    spark.sql("""CREATE TABLE graft_pt.default.pt_guard_b (k BIGINT, v STRING)
                 TBLPROPERTIES('bucket_by'='k','buckets'='4')""")
    // a bucketed table cannot gain a value partition
    intercept[Exception] {
      spark.sql("""ALTER TABLE graft_pt.default.pt_guard_b
                   SET TBLPROPERTIES('partition_by'='k')""") }
    spark.sql("DROP TABLE graft_pt.default.pt_guard_b")
  }

  test("compaction never merges groups written under different partition specs") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_cx")
    spark.sql("""CREATE TABLE graft_pt.default.pt_cx (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    // two small spec-0 commits into ONE day
    spark.sql("INSERT INTO graft_pt.default.pt_cx VALUES (timestamp_ntz'2024-08-01 01:00:00', 1)")
    spark.sql("INSERT INTO graft_pt.default.pt_cx VALUES (timestamp_ntz'2024-08-01 02:00:00', 2)")
    spark.sql("""ALTER TABLE graft_pt.default.pt_cx
                 SET TBLPROPERTIES('partition_transform'='months')""")
    // two small spec-1 commits into the SAME day (now routed by month)
    spark.sql("INSERT INTO graft_pt.default.pt_cx VALUES (timestamp_ntz'2024-08-01 03:00:00', 3)")
    spark.sql("INSERT INTO graft_pt.default.pt_cx VALUES (timestamp_ntz'2024-08-01 04:00:00', 4)")
    val dir = tableDir("graft_pt", "pt_cx")
    assert(GroupFiles.live(dir).size === 4)
    spark.sql("CALL graft_pt.system.compact('default.pt_cx', 64)")
    val after = GroupFiles.live(dir)
    // one bin per (spec, partition-value): the day bin and the month bin
    assert(after.size === 2, s"expected 2 spec-separated bins, got ${after.size}")
    assert(after.flatMap(_.part).toSet ===
      Set(java.time.LocalDate.of(2024, 8, 1).toEpochDay.toString, "1.655"))
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) s FROM graft_pt.default.pt_cx")
      .collect()(0).getLong(0) === 10)
    spark.sql("DROP TABLE graft_pt.default.pt_cx")
  }

  test("CREATE rejections: wrong column type; two transforms; bucket+identity conflict") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_bad")
    // days over BIGINT must fail loudly at CREATE (or first load), never route garbage
    val e1 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_pt.default.pt_bad (k BIGINT, v STRING)
                   PARTITIONED BY (days(k))""")
      spark.sql("INSERT INTO graft_pt.default.pt_bad VALUES (1, 'x')")
    }
    assert(e1.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_bad")
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_pt.default.pt_bad (ts TIMESTAMP_NTZ, k BIGINT)
                   PARTITIONED BY (days(ts), k)""")
      spark.sql("INSERT INTO graft_pt.default.pt_bad VALUES (timestamp_ntz'2024-01-01 00:00:00', 1)")
    }
    assert(e2.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_bad")
  }

  test("compaction bins within a partition and keeps #p tags") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft_pt.default.pt_compact")
    spark.sql("""CREATE TABLE graft_pt.default.pt_compact (ts TIMESTAMP_NTZ, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    // three small commits into the same two days → 6 groups
    for (i <- 0 until 3)
      spark.sql(s"""INSERT INTO graft_pt.default.pt_compact VALUES
                    (timestamp_ntz'2024-07-01 0$i:00:00', $i),
                    (timestamp_ntz'2024-07-02 0$i:00:00', ${i + 10})""")
    val dir = tableDir("graft_pt", "pt_compact")
    val before = GroupFiles.live(dir)
    assert(before.size >= 4)
    spark.sql("CALL graft_pt.system.compact('default.pt_compact', 64)")
    val after = GroupFiles.live(dir)
    assert(after.size === 2, s"expected one group per day, got ${after.size}")
    assert(after.flatMap(_.part).map(_.toLong).toSet.size === 2)
    assert(spark.table("graft_pt.default.pt_compact").count() === 6)
    spark.sql("DROP TABLE graft_pt.default.pt_compact")
  }
}
