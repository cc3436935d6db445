package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Consistent MULTI-TABLE snapshot reads (VERDICT r9 #7) — the read-side
  * analogue of `Sinks.atomicOverwriteAll` and the heritage of postpy's
  * `execute_transaction` (reference sql.py: one connection, one
  * transaction, so a multi-statement read saw one database state). A
  * report that joins N catalog tables must never see table A at version 7
  * and table B at version 9 because a writer committed between the two
  * table reads — the classic torn read that a snapshot-isolated database
  * rules out and plain "read the current table twice" does not.
  *
  * [[Snapshot.pin]] captures each table's CURRENT committed version (from
  * its `.snapshots` metadata table — answered from the manifest, no data
  * files opened) into an immutable version vector; every subsequent
  * [[PinnedSnapshot.table]] read resolves strictly through
  * `VERSION AS OF`, so concurrent commits are invisible for the life of
  * the pin. Versions are retained for `GroupFiles.RETAIN` commits — a
  * pin held across more than that many commits fails loudly on read,
  * exactly like any expired time travel (no silent fallback to "latest").
  *
  * Scale: the pin itself is a metadata read per table (one manifest line);
  * pinned reads plan exactly like current reads (same group pruning,
  * manifest stats keyed to the pinned snapshot).
  */
final case class PinnedSnapshot(versions: Map[String, Long]) {

  /** Read `name` at its pinned version. Fails if the table was not part
    * of the pin — silently reading "latest" for an unpinned table would
    * reintroduce the torn read this type exists to prevent.
    */
  def table(spark: SparkSession, name: String): DataFrame = {
    val v = versions.getOrElse(name, throw new IllegalArgumentException(
      s"table $name is not part of this pinned snapshot " +
        s"(pinned: ${versions.keys.toSeq.sorted.mkString(", ")})"))
    spark.sql(s"SELECT * FROM $name VERSION AS OF $v")
  }
}

object Snapshot {

  /** Current committed version of a catalog table, from its `.snapshots`
    * metadata table (manifest-only — no data file is opened).
    */
  def currentVersion(spark: SparkSession, name: String): Long =
    spark.sql(s"SELECT max(version) FROM $name.snapshots").head().getLong(0)

  /** Pin the given tables' current versions into one consistent vector.
    * Tables are pinned in name order; a commit landing DURING the pin
    * loop can only be excluded or included per table the same way any
    * database snapshot drawn at an instant includes exactly the commits
    * before it — what the pin rules out is DRIFT BETWEEN READS after the
    * vector exists.
    */
  def pin(spark: SparkSession, names: Seq[String]): PinnedSnapshot =
    PinnedSnapshot(names.sorted.map(n => n -> currentVersion(spark, n)).toMap)
}
