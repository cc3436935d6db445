package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GroupFiles

/** Snapshot TAGS: named refs pinned beyond the retention window — the
  * "this exact snapshot trained model v1" primitive. Pins: VERSION AS OF
  * by name, retention immunity (automatic horizon AND explicit
  * expire_snapshots), file survival under the sweep, drop-then-expire,
  * name validation, and the t.tags metadata table.
  */
class TagsSpec extends AnyFunSuite with SparkFixture {

  private val T = "graft_tags.default.tagged_t"

  private def dir() = {
    val cat = spark.sessionState.catalogManager.catalog("graft_tags")
      .asInstanceOf[graft.catalog.GraftCatalog]
    Paths.get(cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("default"), "tagged_t")).asInstanceOf[graft.catalog.GraftTable].location)
  }

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_tags", "graft.catalog.GraftCatalog")
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k STRING, m BIGINT)")
  }

  test("tag + VERSION AS OF 'name' reads the pinned snapshot; tags listable") {
    setup()
    spark.sql(s"INSERT INTO $T VALUES ('a', 1)")
    spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'v1-train')")
    spark.sql(s"INSERT INTO $T VALUES ('b', 2)")
    spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'audit', 2)")

    assert(spark.sql(s"SELECT * FROM $T VERSION AS OF 'v1-train'").count() === 1)
    assert(spark.sql(s"SELECT * FROM $T VERSION AS OF 'audit'").count() === 2)
    val tags = spark.sql(s"SELECT name, version FROM $T.tags ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tags === Seq(("audit", 2L), ("v1-train", 1L)))

    // unknown tag and bad names fail loudly
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $T VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("nope"))
    intercept[Exception](
      spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', '123')"))
    intercept[Exception](
      spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'bad name')"))
    intercept[Exception](
      spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'ok', 99)"))
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("a tagged snapshot survives the automatic retention horizon; untagged expire") {
    setup()
    spark.sql(s"INSERT INTO $T VALUES ('seed', 0)")
    spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'pinned')") // v1
    // push far past RETAIN so v1 would normally be long gone
    (1 to GroupFiles.RETAIN + 3).foreach(i =>
      spark.sql(s"INSERT INTO $T VALUES ('r$i', $i)"))
    val vs = GroupFiles.versions(dir())
    assert(vs.contains(1L), s"tagged v1 must survive, have $vs")
    assert(!vs.contains(2L), "untagged v2 must have expired")
    // and its FILES survived the sweep: the read works end to end
    val pinned = spark.sql(s"SELECT k FROM $T VERSION AS OF 'pinned'").collect()
    assert(pinned.map(_.getString(0)).toSeq === Seq("seed"))

    // dropping the tag releases it: the next expiration sweeps v1
    assert(spark.sql(s"CALL graft_tags.system.drop_tag('default.tagged_t', 'pinned')")
      .collect()(0).getBoolean(0))
    spark.sql(s"CALL graft_tags.system.expire_snapshots('default.tagged_t', 2)")
    assert(!GroupFiles.versions(dir()).contains(1L))
    intercept[Exception](spark.sql(s"SELECT * FROM $T VERSION AS OF 1").collect())
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("explicit expire_snapshots keeps tagged; drop_tag on a missing tag reports false") {
    setup()
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO $T VALUES ('x$i', $i)"))
    spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'keep2', 2)")
    spark.sql(s"CALL graft_tags.system.expire_snapshots('default.tagged_t', 1)")
    val vs = GroupFiles.versions(dir())
    assert(vs.contains(2L) && vs.contains(5L) && !vs.contains(3L))
    assert(spark.sql(s"SELECT COUNT(*) FROM $T VERSION AS OF 'keep2'")
      .collect()(0).getLong(0) === 2)
    assert(!spark.sql(s"CALL graft_tags.system.drop_tag('default.tagged_t', 'ghost')")
      .collect()(0).getBoolean(0))
    // re-tagging an existing name MOVES it
    spark.sql(s"CALL graft_tags.system.tag('default.tagged_t', 'keep2', 5)")
    assert(GroupFiles.tags(dir())("keep2") === 5L)
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }
}
