package graft.catalog

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** FILE-BACKED DataSource-V2 catalog whose tables support ROW-LEVEL
  * OPERATIONS — this is what makes `MERGE INTO` EXECUTABLE SQL against the
  * engine (the reference's `INSERT … ON CONFLICT DO UPDATE`,
  * postpy dml.upsert_records [unverified, SURVEY §0]), rather than only a
  * dataflow (ops.Merge.upsert). Register with
  * `spark.sql.catalog.<name> = graft.catalog.GraftCatalog`; the warehouse
  * directory comes from `spark.sql.catalog.<name>.warehouse` (defaults to
  * a fixed dir under java.io.tmpdir).
  *
  * Storage is a minimal table FORMAT, not driver memory: each table is a
  * directory of immutable row-group files plus a `manifest` listing the
  * live ones. Write tasks stream their rows to new group files EXECUTOR-
  * side (nothing is collected to the driver); a commit publishes the new
  * live set by atomically replacing the manifest — readers see the pre- or
  * post-commit file set, never a mix. This is the Iceberg/Delta commit
  * shape in miniature: data files are immutable, the manifest swap is the
  * only mutation, and a crashed job leaves only unreferenced orphan files.
  *
  * The row-level strategy is GROUP-BASED copy-on-write sharded by file:
  * Spark's RewriteMergeIntoTable plans a ReplaceData — the operation's
  * scan reads the live groups, the post-merge rows (updated matched rows +
  * carried-over unmatched rows + inserts) are written as NEW groups, and
  * the commit swaps the manifest from the old file set to the new one. At
  * 100 TB the missing piece is runtime group filtering (skip rewriting
  * files whose key range can't match the source — needs per-file column
  * stats in the manifest); the commit protocol and file layout here are
  * exactly what that optimization plugs into.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_catalog")
  private val tables = new TrieMap[String, GraftTable]()

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      Paths.get(System.getProperty("java.io.tmpdir"), s"graft_catalog_$name").toString))
  }
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keys.toArray.sorted.map { k =>
      val parts = k.split('.'); Identifier.of(parts.dropRight(1), parts.last)
    }.filter(_.namespace().sameElements(namespace))

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(key(ident), throw new NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tables.contains(key(ident))) throw new TableAlreadyExistsException(ident)
    val location = warehouse.resolve(key(ident).replace('.', '/'))
    GroupFiles.reset(location) // a fresh table owns a fresh directory
    val t = new GraftTable(key(ident), schema, location.toString)
    tables.put(key(ident), t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)) match {
      case Some(t) => GroupFiles.delete(Paths.get(t.location)); true
      case None => false
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    tables.remove(key(oldIdent)) match {
      case Some(t) => tables.put(key(newIdent), t) // location is name-independent
      case None => throw new NoSuchTableException(oldIdent)
    }

  // -- minimal namespace surface (flat catalog: every namespace "exists") --
  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean = namespace.length <= 1
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = ()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = true
}

/** The on-disk layout: immutable `<uuid>.rows` group files (4-byte field
  * count header, then length-prefixed UnsafeRow payloads) + a `manifest`
  * text file naming the live groups. The manifest replace is the atomic
  * commit point (same-filesystem ATOMIC_MOVE, like io.Sinks).
  */
object GroupFiles {
  private val MANIFEST = "manifest"

  def reset(dir: Path): Unit = { delete(dir); Files.createDirectories(dir) }

  def live(dir: Path): Seq[String] = {
    val m = dir.resolve(MANIFEST)
    if (Files.exists(m)) Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty) else Seq.empty
  }

  /** Atomically publish `files` as the new live set, then delete the
    * groups the old manifest referenced that are no longer live (safe
    * AFTER the swap: no reader planning against the new manifest can see
    * them; in-flight readers on local/HDFS-style filesystems hold the
    * open handle).
    */
  def publish(dir: Path, files: Seq[String]): Unit = {
    val old = live(dir)
    val tmp = dir.resolve(MANIFEST + ".tmp")
    Files.write(tmp, files.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(MANIFEST), StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
    (old.toSet -- files.toSet).foreach(f => Files.deleteIfExists(dir.resolve(f)))
  }

  def delete(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally s.close()
    }
}

/** A table whose content is a manifest-listed set of immutable row-group
  * files; reads stream one partition per group file, writes stream rows to
  * new group files task-side and swap the manifest on commit.
  */
class GraftTable(tableName: String, tableSchema: StructType, val location: String)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this)

  /** Plain writes (INSERT INTO …) append; INSERT OVERWRITE truncates. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(this, info.schema(), replaceAll = false)

  /** MERGE/UPDATE/DELETE: group-based copy-on-write — the operation's
    * scan reads the live groups, its write publishes the rewritten set.
    */
  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftScanBuilder(GraftTable.this)
      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
        new GraftWriteBuilder(GraftTable.this, writeInfo.schema(), replaceAll = true)
    }
}

class GraftScanBuilder(table: GraftTable) extends ScanBuilder {
  override def build(): Scan = new Scan with Batch {
    // the live set is pinned at PLAN time: a concurrent commit during
    // execution cannot change which groups this scan reads
    private val files = GroupFiles.live(Paths.get(table.location))
    override def readSchema(): StructType = table.schema()
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      files.map(f => GraftInputPartition(
        Paths.get(table.location).resolve(f).toString): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      (partition: InputPartition) => {
        val path = partition.asInstanceOf[GraftInputPartition].path
        new PartitionReader[InternalRow] {
          private val in = new DataInputStream(new BufferedInputStream(
            Files.newInputStream(Paths.get(path))))
          private val numFields = in.readInt()
          private val row = new UnsafeRow(numFields)
          private var done = false
          override def next(): Boolean =
            try {
              val len = in.readInt()
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              row.pointTo(bytes, len)
              true
            } catch { case _: EOFException => done = true; false }
          override def get(): InternalRow = row
          override def close(): Unit = in.close()
        }
      }
  }
}

/** One group file per partition; only the path travels. */
case class GraftInputPartition(path: String) extends InputPartition

class GraftWriteBuilder(table: GraftTable, writeSchema: StructType, replaceAll: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var truncateRequested = false
  override def truncate(): WriteBuilder = { truncateRequested = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(table, writeSchema, replaceAll || truncateRequested)
  }
}

class GraftBatchWrite(table: GraftTable, writeSchema: StructType,
                      replaceAll: Boolean) extends BatchWrite {
  // a standalone case class, NOT a lambda: a closure here would capture
  // this BatchWrite (and through it the non-serializable table)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(table.location, writeSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(table.location)
    val written = messages.flatMap(_.asInstanceOf[GraftCommitMessage].files)
    val files = if (replaceAll) written.toSeq
                else GroupFiles.live(dir) ++ written
    GroupFiles.publish(dir, files)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(table.location)
    messages.foreach {
      case GraftCommitMessage(fs) => fs.foreach(f => Files.deleteIfExists(dir.resolve(f)))
      case _ => ()
    }
  }
}

case class GraftCommitMessage(files: Seq[String]) extends WriterCommitMessage

case class GraftWriterFactory(location: String, writeSchema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Two layout quirks are handled here:
      //  1. incoming rows may be GenericInternalRows whose UTF8Strings
      //     point into REUSED reader buffers — every record is projected
      //     to a fresh UnsafeRow so the serialized bytes are self-owned;
      //  2. Spark's group-based row-level rewrites (MERGE/UPDATE/DELETE →
      //     ReplaceData) PREPEND an internal operation column to the
      //     query output, and when the operation declares no metadata
      //     columns the plain writing task hands the row over without
      //     applying ReplaceDataProjections.rowProjection — so the table
      //     columns sit at offset 1. Detected from the first record's
      //     width; the op value is a constant marker for group-based
      //     writes (all emitted rows are keepers), so only position
      //     matters.
      private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
      private var out: DataOutputStream = _
      private val copyBuffer = new Array[Byte](8192) // for off-heap-backed rows
      private val fileName = f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.rows"
      private val tmpPath = Paths.get(location).resolve(fileName + ".tmp")
      private val finalPath = Paths.get(location).resolve(fileName)
      private var wrote = false

      override def write(record: InternalRow): Unit = {
        if (proj == null) {
          val offset = record.numFields - writeSchema.length
          require(offset == 0 || offset == 1,
            s"row width ${record.numFields} does not match write schema ${writeSchema.length}")
          val refs = writeSchema.fields.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i + offset, f.dataType, nullable = true): org.apache.spark.sql.catalyst.expressions.Expression
          }
          proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(refs.toIndexedSeq)
          out = new DataOutputStream(new BufferedOutputStream(
            Files.newOutputStream(tmpPath)))
          out.writeInt(writeSchema.length)
          wrote = true
        }
        val u = proj(record) // projection output is reused — serialize now
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, copyBuffer)
      }
      override def commit(): WriterCommitMessage =
        if (wrote) {
          out.close()
          Files.move(tmpPath, finalPath, StandardCopyOption.ATOMIC_MOVE)
          GraftCommitMessage(Seq(fileName))
        } else GraftCommitMessage(Seq.empty) // empty task: no file at all
      override def abort(): Unit = {
        if (out != null) out.close()
        Files.deleteIfExists(tmpPath); Files.deleteIfExists(finalPath)
      }
      override def close(): Unit = ()
    }
}
