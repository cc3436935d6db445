package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{GroupFiles, IncrementalView}

/** Pins the IncrementalView equivalence contract: chaining `refresh`
  * across a mixed commit history (INSERT, MERGE-update, DELETE) lands on
  * exactly `build` at the final version — the summary never touches the
  * base table after the seed, only the change feed.
  *
  * Summary schema: dims ++ __n ++ per-measure (__nn_c, __sum_c) — the
  * non-null counter is load-bearing (see the mixed-NULL test below).
  */
class IncrementalViewSpec extends AnyFunSuite with SparkFixture {

  private val T = "graft_ivm.default.ivm_t"

  /** (k, __n, __sum_m) — skips the __nn_m column at index 2. */
  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq

  private def tableDir(name: String) = {
    val cat = spark.sessionState.catalogManager.catalog("graft_ivm")
      .asInstanceOf[graft.catalog.GraftCatalog]
    Paths.get(cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("default"), name)).asInstanceOf[graft.catalog.GraftTable].location)
  }

  test("refresh chain over INSERT/MERGE/DELETE equals full rebuild at every step") {
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, id BIGINT, m BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES ('a', 1, 10), ('a', 2, 20), ('b', 3, 5)")

    val dir = tableDir("ivm_t")
    def v(): Long = GroupFiles.versions(dir).max

    val dims = Seq("k"); val sums = Seq("m")
    val v1 = v()
    var state = IncrementalView.build(spark, T, dims, sums).localCheckpoint()
    assert(sorted(state) === Seq(("a", 2L, 30L), ("b", 1L, 5L)))

    // commit 2: plain insert, new group
    spark.sql(s"INSERT INTO $T VALUES ('b', 4, 7), ('c', 5, 1)")
    val v2 = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, v1, v2).localCheckpoint()
    assert(sorted(state) === sorted(IncrementalView.build(spark, T, dims, sums)))

    // commit 3: MERGE updates one row (delete+insert pair in the feed)
    spark.sql(
      s"""MERGE INTO $T t USING (SELECT 2 AS id, 200 AS m) s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET m = s.m""".stripMargin)
    val v3 = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, v2, v3).localCheckpoint()
    assert(sorted(state) === Seq(("a", 2L, 210L), ("b", 2L, 12L), ("c", 1L, 1L)))

    // commit 4: DELETE empties group 'c' — its summary row must VANISH
    spark.sql(s"DELETE FROM $T WHERE k = 'c'")
    val v4 = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, v3, v4).localCheckpoint()
    assert(sorted(state) === sorted(IncrementalView.build(spark, T, dims, sums)))
    assert(!sorted(state).exists(_._1 == "c"))

    // same-version refresh is the identity (no feed read at all)
    assert(sorted(IncrementalView.refresh(spark, T, dims, sums, state, v4, v4))
      === sorted(state))

    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("refresh over a MERGE-ON-READ UPDATE (vectors + appended images) equals rebuild") {
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, id BIGINT, m BIGINT)")
    spark.sql(s"INSERT INTO $T SELECT CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id, id " +
      "FROM range(0, 40, 1, 1)")
    val dir = tableDir("ivm_t")
    def v(): Long = GroupFiles.versions(dir).max
    val dims = Seq("k"); val sums = Seq("m")
    val v1 = v()
    var state = IncrementalView.build(spark, T, dims, sums).localCheckpoint()

    // MoR UPDATE moves rows ACROSS groups of the view: ids 0..9 flip to
    // dimension 'c' — the base table's group is masked, images appended
    spark.sql(s"UPDATE $T SET k = 'c', m = m + 100 WHERE id < 10")
    assert(GroupFiles.live(dir).exists(_.deletes.isDefined),
      "UPDATE must have taken the merge-on-read path for this test to bite")
    val v2 = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, v1, v2).localCheckpoint()
    assert(sorted(state) === sorted(IncrementalView.build(spark, T, dims, sums)))
    assert(sorted(state).exists(_._1 == "c"))
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("a summary seeded on a NEVER-WRITTEN base refreshes through the first commits") {
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, id BIGINT, m BIGINT)")
    val V = "graft_ivm.default.ivm_v0view"
    spark.sql(s"DROP TABLE IF EXISTS $V")
    spark.sql(s"CREATE TABLE $V (k STRING, __n BIGINT, __nn_m BIGINT, __sum_m BIGINT)")
    // seed at version 0 (no manifest yet): the stored view is empty and
    // the returned cursor must be consumable by the NEXT refresh
    val v0 = IncrementalView.materialize(spark, T, V, Seq("k"), Seq("m"))
    assert(v0 === 0L)
    assert(spark.table(V).count() === 0)
    // first-ever base commit, then the 0 -> v1 refresh replays it
    spark.sql(s"INSERT INTO $T VALUES ('a', 1, 10), ('b', 2, 5)")
    val v1 = IncrementalView.refreshMaterialized(spark, T, V, Seq("k"), Seq("m"), v0)
    assert(v1 > 0)
    assert(spark.table(V).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet === Set(("a", 1L, 10L), ("b", 1L, 5L)))
    // pre-counter state schemas are rejected with an explanation
    val legacy = spark.sql("SELECT 'a' AS k, 1L AS __n, 10L AS __sum_m")
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, T, Seq("k"), Seq("m"), legacy, 0, v1)
    }
    assert(e.getMessage.contains("__nn_m"))
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"DROP TABLE IF EXISTS $V")
  }

  test("NULL dimension values and NULL measures keep refresh == build") {
    val T3 = "graft_ivm.default.ivm_t3"
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T3")
    spark.sql(s"CREATE TABLE $T3 (k STRING, id BIGINT, m BIGINT)")
    // group 'n' has an all-NULL measure; group NULL is a real dimension
    // value; group 'x' MIXES null and non-null measures
    spark.sql(s"""INSERT INTO $T3 VALUES ('n', 1, NULL), ('n', 2, NULL),
                  (NULL, 3, 7), ('x', 4, 5), ('x', 5, NULL)""")

    val dir = tableDir("ivm_t3")
    def v(): Long = GroupFiles.versions(dir).max

    val dims = Seq("k"); val sums = Seq("m")
    val v0 = v()
    val seed = IncrementalView.build(spark, T3, dims, sums).localCheckpoint()
    // all-NULL measure group: build yields a NULL sum, and refresh must not
    // turn it into 0
    assert(seed.filter("k = 'n'").collect()(0).isNullAt(3))

    // delete the NULL-dim group (a plain equi-join would never match it
    // and the stale row would survive); add to the all-NULL group; and —
    // the case only the __nn counter can decide — delete group x's LAST
    // non-null measure, which must flip its sum from 5 back to NULL
    spark.sql(s"DELETE FROM $T3 WHERE k IS NULL")
    spark.sql(s"INSERT INTO $T3 VALUES ('n', 6, NULL)")
    spark.sql(s"DELETE FROM $T3 WHERE id = 4")
    val vN = v()
    val got = IncrementalView.refresh(spark, T3, dims, sums, seed, v0, vN)
    val want = IncrementalView.build(spark, T3, dims, sums)
    val norm = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
                 if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(norm(got) === norm(want))
    assert(!norm(got).exists(_._1.isEmpty), "deleted NULL-dim group must vanish")
    assert(norm(got) === Set((Some("n"), 3L, None), (Some("x"), 1L, None)))
    spark.sql(s"DROP TABLE IF EXISTS $T3")
  }

  test("materialized summary: atomic in-place refresh, history time-travelable") {
    val B = "graft_ivm.default.ivm_base"
    val V = "graft_ivm.default.ivm_view"
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $B"); spark.sql(s"DROP TABLE IF EXISTS $V")
    spark.sql(s"CREATE TABLE $B (k STRING, id BIGINT, m BIGINT)")
    // deliberately REORDERED view columns: overwrite must align by name
    spark.sql(s"CREATE TABLE $V (k STRING, __sum_m BIGINT, __nn_m BIGINT, __n BIGINT)")
    spark.sql(s"INSERT INTO $B VALUES ('a', 1, 10), ('b', 2, 20)")

    def viewRows() = spark.table(V).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(1))).toSeq

    val dims = Seq("k"); val sums = Seq("m")
    val v0 = IncrementalView.materialize(spark, B, V, dims, sums)
    assert(viewRows() === Seq(("a", 1L, 10L), ("b", 1L, 20L)))
    val vloc = tableDir("ivm_view")
    val viewVerAfterMaterialize = GroupFiles.versions(vloc).max

    spark.sql(s"INSERT INTO $B VALUES ('a', 3, 5)")
    spark.sql(s"DELETE FROM $B WHERE id = 2")
    val v1 = IncrementalView.refreshMaterialized(spark, B, V, dims, sums, v0)
    assert(v1 > v0)
    assert(viewRows() === Seq(("a", 2L, 15L)))
    assert(viewRows() === sorted(IncrementalView.build(spark, B, dims, sums))
      .map(t => (t._1, t._2, t._3)))

    // the view table is itself versioned: the PRE-refresh summary is one
    // VERSION AS OF away
    val hist = spark.sql(s"SELECT * FROM $V VERSION AS OF $viewVerAfterMaterialize")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(3), r.getLong(1))).toSeq
    assert(hist === Seq(("a", 1L, 10L), ("b", 1L, 20L)))

    // no base movement → no-op: same returned version AND no view commit
    val viewVerBeforeNoop = GroupFiles.versions(vloc).max
    val v2 = IncrementalView.refreshMaterialized(spark, B, V, dims, sums, v1)
    assert(v2 === v1)
    assert(GroupFiles.versions(vloc).max === viewVerBeforeNoop,
      "a no-op refresh must not commit a new view version")
    spark.sql(s"DROP TABLE IF EXISTS $B"); spark.sql(s"DROP TABLE IF EXISTS $V")
  }

  test("one refresh across a multi-commit window equals chained refreshes") {
    val T2 = "graft_ivm.default.ivm_t2"
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T2")
    spark.sql(s"CREATE TABLE $T2 (k STRING, id BIGINT, m BIGINT)")
    spark.sql(s"INSERT INTO $T2 VALUES ('a', 1, 10), ('b', 2, 20)")

    val dir = tableDir("ivm_t2")
    def v(): Long = GroupFiles.versions(dir).max

    val dims = Seq("k"); val sums = Seq("m")
    val v0 = v()
    val seed = IncrementalView.build(spark, T2, dims, sums).localCheckpoint()

    spark.sql(s"INSERT INTO $T2 VALUES ('a', 3, 1)")
    spark.sql(s"DELETE FROM $T2 WHERE id = 2")
    spark.sql(s"INSERT INTO $T2 VALUES ('c', 4, 9)")
    val vN = v()

    val oneHop = IncrementalView.refresh(spark, T2, dims, sums, seed, v0, vN)
    assert(sorted(oneHop) === sorted(IncrementalView.build(spark, T2, dims, sums)))
    spark.sql(s"DROP TABLE IF EXISTS $T2")
  }

  test("streaming materialized view: each CDC micro-batch lands in the summary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, unix_micros}
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val B = "graft_ivm.default.ivm_sbase"; val V = "graft_ivm.default.ivm_sview"
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $B"); spark.sql(s"DROP TABLE IF EXISTS $V")
    spark.sql(s"CREATE TABLE $B (user_id BIGINT, event_type STRING, value BIGINT, us BIGINT)")
    spark.sql(s"CREATE TABLE $V (event_type STRING, __n BIGINT, __nn_value BIGINT, __sum_value BIGINT)")
    // pre-existing base rows: the seed must capture them before any batch
    spark.sql(s"INSERT INTO $B VALUES (1, 'u', 10, 0), (2, 'u', 20, 0)")

    val events = MemoryStream[Ev]
    val base = 1700000000000L
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivm_stream").toString
    val dims = Seq("event_type"); val sums = Seq("value")
    val q = IncrementalView.streamingMaterialize(
      events.toDF.select(col("user_id"), col("event_type"),
                         col("value").cast("bigint").as("value"),
                         unix_micros(col("ts")).as("us")),
      B, V, Seq("user_id"), "us", dims, sums, s"$ckpt/ckpt")
    try {
      def viewNow() = spark.table(V).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      def rebuilt() = IncrementalView.build(spark, B, dims, sums).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet

      // the seed reflects the pre-stream rows
      assert(viewNow() === Set(("u", 2L, 30L)))

      // batch 1: new user in a NEW group + an update that MOVES user 2
      // between groups (delete from 'u', insert into 'w' in the feed)
      events.addData(Ev(101, new Timestamp(base), 3, "w", 7.0),
                     Ev(102, new Timestamp(base + 1000), 2, "w", 21.0))
      q.processAllAvailable()
      assert(viewNow() === Set(("u", 1L, 10L), ("w", 2L, 28L)))
      assert(viewNow() === rebuilt())

      // batch 2: in-batch duplicate (later us wins) + another group move
      events.addData(Ev(103, new Timestamp(base + 2000), 1, "w", 11.0),
                     Ev(104, new Timestamp(base + 3000), 1, "u", 12.0))
      q.processAllAvailable()
      assert(viewNow() === Set(("u", 1L, 12L), ("w", 2L, 28L)))
      assert(viewNow() === rebuilt())
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $B"); spark.sql(s"DROP TABLE IF EXISTS $V")
    }
  }

  test("MIN/MAX refresh chain == rebuild, including extremum-deleting commits") {
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, id BIGINT, m BIGINT)")
    // duplicate minimum in 'a' (10 twice) — deleting ONE occurrence must
    // keep min 10 (the conservative rescan recomputes it)
    spark.sql(s"INSERT INTO $T VALUES ('a', 1, 10), ('a', 2, 10), ('a', 3, 50), ('b', 4, 5)")

    val dir = tableDir("ivm_t")
    def v(): Long = GroupFiles.versions(dir).max
    val dims = Seq("k"); val sums = Seq("m"); val mm = Seq("m")
    def mmOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1),
                   Option(r.get(r.fieldIndex("__min_m"))),
                   Option(r.get(r.fieldIndex("__max_m"))))).toSeq
    def rebuilt() = mmOf(IncrementalView.build(spark, T, dims, sums, mm))

    var at = v()
    var state = IncrementalView.build(spark, T, dims, sums, mm).localCheckpoint()
    assert(mmOf(state) === Seq(("a", 3L, Some(10L), Some(50L)), ("b", 1L, Some(5L), Some(5L))))

    // commit: insert-only — extends extremes incrementally (no rescan path)
    spark.sql(s"INSERT INTO $T VALUES ('a', 5, 3), ('b', 6, 99)")
    var nv = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, at, nv, mm).localCheckpoint()
    at = nv
    assert(mmOf(state) === Seq(("a", 4L, Some(3L), Some(50L)), ("b", 2L, Some(5L), Some(99L))))
    assert(mmOf(state) === rebuilt())

    // commit: DELETE the current max of 'a' (50) — retraction, rescan path
    spark.sql(s"DELETE FROM $T WHERE id = 3")
    nv = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, at, nv, mm).localCheckpoint()
    at = nv
    assert(mmOf(state) === Seq(("a", 3L, Some(3L), Some(10L)), ("b", 2L, Some(5L), Some(99L))))
    assert(mmOf(state) === rebuilt())

    // commit: delete ONE of the duplicate 10s — min must survive as 10
    spark.sql(s"DELETE FROM $T WHERE id = 1")
    spark.sql(s"DELETE FROM $T WHERE id = 5") // and then the actual min 3
    nv = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, at, nv, mm).localCheckpoint()
    at = nv
    assert(mmOf(state) === Seq(("a", 1L, Some(10L), Some(10L)), ("b", 2L, Some(5L), Some(99L))))
    assert(mmOf(state) === rebuilt())

    // commit: MERGE-update b's max away (99 -> 1): delete+insert feed pair
    spark.sql(
      s"""MERGE INTO $T t USING (SELECT 6 AS id, 1 AS m) s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET m = s.m""".stripMargin)
    nv = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, at, nv, mm).localCheckpoint()
    at = nv
    assert(mmOf(state) === Seq(("a", 1L, Some(10L), Some(10L)), ("b", 2L, Some(1L), Some(5L))))
    assert(mmOf(state) === rebuilt())

    // commit: group vanishes entirely — no summary row, no rescan residue
    spark.sql(s"DELETE FROM $T WHERE k = 'a'")
    nv = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, at, nv, mm).localCheckpoint()
    assert(mmOf(state) === rebuilt())
    assert(!mmOf(state).exists(_._1 == "a"))

    // NULL measures: all-NULL group has NULL min/max through the chain
    spark.sql(s"INSERT INTO $T VALUES ('n', 100, NULL), ('n', 101, NULL)")
    val nv2 = v()
    state = IncrementalView.refresh(spark, T, dims, sums, state, nv, nv2, mm).localCheckpoint()
    assert(mmOf(state).find(_._1 == "n").get === (("n", 2L, None, None)))
    assert(mmOf(state) === rebuilt())

    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("JOIN-view refresh chain equals re-join rebuild, incl. same-window deltas on both sides") {
    spark.conf.set("spark.sql.catalog.graft_ivm", "graft.catalog.GraftCatalog")
    val A = "graft_ivm.default.ivm_fact"
    val B = "graft_ivm.default.ivm_dim"
    spark.sql(s"DROP TABLE IF EXISTS $A")
    spark.sql(s"DROP TABLE IF EXISTS $B")
    spark.sql(s"CREATE TABLE $A (fk BIGINT, fid BIGINT, m BIGINT)")
    spark.sql(s"CREATE TABLE $B (pk BIGINT, seg STRING)")
    spark.sql(s"INSERT INTO $A VALUES (1, 100, 10), (1, 101, 20), (2, 102, 5)")
    spark.sql(s"INSERT INTO $B VALUES (1, 'x'), (2, 'y')")

    val dirA = tableDir("ivm_fact"); val dirB = tableDir("ivm_dim")
    def vA(): Long = GroupFiles.versions(dirA).max
    def vB(): Long = GroupFiles.versions(dirB).max
    val (keysA, keysB) = (Seq("fk"), Seq("pk"))
    val dims = Seq("seg"); val sums = Seq("m")
    def viewSorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("seg").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    def rebuild() = IncrementalView.buildJoin(spark, A, B, keysA, keysB, dims, sums, vA(), vB())

    var (va, vb) = (vA(), vB())
    var state = rebuild().localCheckpoint()
    assert(viewSorted(state) === Seq(("x", 2L, 30L), ("y", 1L, 5L)))

    // commit on A only: new rows under existing and missing join keys
    // (fk=3 has no dim partner yet — must contribute nothing)
    spark.sql(s"INSERT INTO $A VALUES (2, 103, 7), (3, 104, 100)")
    state = IncrementalView.refreshJoin(spark, A, B, keysA, keysB, dims, sums,
      state, va, vA(), vb, vB()).localCheckpoint()
    va = vA(); vb = vB()
    assert(viewSorted(state) === viewSorted(rebuild()))
    assert(viewSorted(state) === Seq(("x", 2L, 30L), ("y", 2L, 12L)))

    // commit on B only: the late-arriving dim key 3 picks up BOTH waiting
    // fact rows? (only 104) — key multiplicity via a second pk=1 row too:
    // every fk=1 fact row now joins TWICE into segment 'x2'
    spark.sql(s"INSERT INTO $B VALUES (3, 'z'), (1, 'x2')")
    state = IncrementalView.refreshJoin(spark, A, B, keysA, keysB, dims, sums,
      state, va, vA(), vb, vB()).localCheckpoint()
    va = vA(); vb = vB()
    assert(viewSorted(state) === viewSorted(rebuild()))
    assert(viewSorted(state) ===
      Seq(("x", 2L, 30L), ("x2", 2L, 30L), ("y", 2L, 12L), ("z", 1L, 100L)))

    // SAME-WINDOW deltas on BOTH sides (exercises the dA x dB product
    // term): a new fact row under a key whose dim row is REPLACED in the
    // same window (MERGE = delete+insert in the feed)
    spark.sql(s"INSERT INTO $A VALUES (2, 105, 1000)")
    spark.sql(
      s"""MERGE INTO $B t USING (SELECT 2 AS pk2, 'y9' AS seg2) s ON t.pk = s.pk2
         |WHEN MATCHED THEN UPDATE SET seg = s.seg2""".stripMargin)
    state = IncrementalView.refreshJoin(spark, A, B, keysA, keysB, dims, sums,
      state, va, vA(), vb, vB()).localCheckpoint()
    va = vA(); vb = vB()
    assert(viewSorted(state) === viewSorted(rebuild()))
    assert(viewSorted(state).exists(r => r._1 == "y9" && r._2 == 3L && r._3 == 1012L))
    assert(!viewSorted(state).exists(_._1 == "y"))

    // delete on A empties a fact key; delete on B kills a whole segment
    spark.sql(s"DELETE FROM $A WHERE fk = 1")
    spark.sql(s"DELETE FROM $B WHERE seg = 'z'")
    state = IncrementalView.refreshJoin(spark, A, B, keysA, keysB, dims, sums,
      state, va, vA(), vb, vB()).localCheckpoint()
    va = vA(); vb = vB()
    assert(viewSorted(state) === viewSorted(rebuild()))
    assert(viewSorted(state) === Seq(("y9", 3L, 1012L)))

    // identity when neither side moved
    assert(viewSorted(IncrementalView.refreshJoin(spark, A, B, keysA, keysB,
      dims, sums, state, va, vA(), vb, vB())) === viewSorted(state))

    spark.sql(s"DROP TABLE IF EXISTS $A")
    spark.sql(s"DROP TABLE IF EXISTS $B")
  }
}
