package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GroupBloom

/** Bloom sidecar mechanics + the plan-time pruning they exist for:
  * point predicates on columns whose per-group (min,max) ranges fully
  * overlap — the case range stats can never prune.
  */
class GroupBloomSpec extends AnyFunSuite with SparkFixture {

  test("builder: no false negatives; sane false-positive rate; promotion path") {
    val b = new GroupBloom.Builder
    val n = 50000
    (0 until n).foreach(i => b.add(i * 2L)) // evens
    val words = b.result()
    assert((0 until n).forall(i => GroupBloom.mightContain(words, i * 2L)),
      "a bloom filter must never forget an inserted value")
    val fp = (0 until n).count(i => GroupBloom.mightContain(words, i * 2L + 1))
    assert(fp < n / 50, s"false-positive rate too high: $fp of $n odd probes hit")

    // promotion: exceed the hash buffer cap (2^20) and stay correct
    val big = new GroupBloom.Builder
    val m = (1 << 20) + 5000
    (0 until m).foreach(i => big.add(i.toLong))
    val bw = big.result()
    assert(GroupBloom.mightContain(bw, 0L) && GroupBloom.mightContain(bw, (m - 1).toLong),
      "values streamed after buffer promotion must be present")
  }

  test("sidecar roundtrip; malformed sidecar reads as empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom")
    val p = dir.resolve("g.bloom")
    val b = new GroupBloom.Builder
    (0L until 100L).foreach(b.add)
    GroupBloom.write(p, Seq(0 -> b.result(), 7 -> b.result()))
    val back = GroupBloom.read(p)
    assert(back.keySet === Set(0, 7))
    assert((0L until 100L).forall(v => GroupBloom.mightContain(back(0), v)))
    java.nio.file.Files.write(p, Array[Byte](1, 2, 3))
    assert(GroupBloom.read(p) === Map.empty, "garbage must read as no-blooms, not crash")
    graft.catalog.GroupFiles.delete(dir)
  }

  test("point predicates prune groups whose key ranges fully overlap") {
    spark.conf.set("spark.sql.catalog.graft_fb", "graft.catalog.GraftCatalog")
    val T = "graft_fb.default.fb_bloom"
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k BIGINT, v STRING)")
    // two groups with IDENTICAL (min,max) spans: evens and odds over the
    // same range — range stats can never tell them apart
    spark.sql(s"INSERT INTO $T SELECT id * 2, 'even' FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $T SELECT id * 2 + 1, 'odd' FROM range(0, 100, 1, 1)")

    def scanParts(sql: String): Int = spark.sql(sql).rdd.getNumPartitions
    // k = 42 lives only in the even group: the odd group's bloom refutes
    assert(scanParts(s"SELECT * FROM $T WHERE k = 42") === 1,
      "bloom must prune the group that cannot hold the key")
    assert(spark.sql(s"SELECT v FROM $T WHERE k = 42").head().getString(0) === "even")
    // an absent key prunes EVERYTHING
    assert(scanParts(s"SELECT * FROM $T WHERE k = 1000") === 0)
    // IN mixing both parities keeps both groups
    assert(spark.sql(s"SELECT count(*) FROM $T WHERE k IN (42, 43)").head().getLong(0) === 2)

    // blooms are field-id-keyed: pruning survives a RENAME COLUMN
    spark.sql(s"ALTER TABLE $T RENAME COLUMN k TO key")
    assert(scanParts(s"SELECT * FROM $T WHERE key = 42") === 1,
      "bloom pruning must survive a column rename (id-keyed, not name-keyed)")
    assert(spark.sql(s"SELECT v FROM $T WHERE key = 42").head().getString(0) === "even")

    // a DELETE by absent key scans nothing and changes nothing
    spark.sql(s"DELETE FROM $T WHERE key = 4242")
    assert(spark.table(T).count() === 200)
    spark.sql(s"DROP TABLE $T")
  }
}
