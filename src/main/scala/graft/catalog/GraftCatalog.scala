package graft.catalog

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory DataSource-V2 catalog whose tables support ROW-LEVEL
  * OPERATIONS — this is what makes `MERGE INTO` EXECUTABLE SQL against the
  * engine (the reference's `INSERT … ON CONFLICT DO UPDATE`,
  * postpy dml.upsert_records [unverified, SURVEY §0]), rather than only a
  * dataflow (ops.Merge.upsert). Register with
  * `spark.sql.catalog.<name> = graft.catalog.GraftCatalog`.
  *
  * The row-level strategy is GROUP-BASED copy-on-write with the whole
  * table as the single group: Spark's RewriteMergeIntoTable plans a
  * ReplaceData — it reads the target through the operation's scan,
  * computes the post-merge rows (updated matched rows + carried-over
  * unmatched rows + inserts), and the commit REPLACES the table content
  * atomically (one volatile array swap). That is exactly the semantics of
  * Iceberg/Delta copy-on-write MERGE with one file group; a production
  * file-backed table would shard groups by file and replace only the
  * groups the scan touched. Driver-memory-bounded by design — the tables
  * exist to give MERGE/UPDATE/DELETE SQL an executable target (and tests
  * an oracle), not to hold 100 TB; at scale the same interfaces bind to a
  * file/object-store table format.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private val tables = new TrieMap[String, GraftTable]()

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
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
    val t = new GraftTable(key(ident), schema)
    tables.put(key(ident), t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = tables.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    tables.remove(key(oldIdent)) match {
      case Some(t) => tables.put(key(newIdent), t)
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

/** A table whose content is a driver-held row array; reads ship the rows
  * inside the InputPartition (fine in local/test scope), writes collect
  * per-task rows into commit messages and swap the array on commit.
  */
class GraftTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  @volatile private[catalog] var rows: Array[InternalRow] = Array.empty

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

  /** MERGE/UPDATE/DELETE: group-based copy-on-write over one group — the
    * operation's scan reads everything, its write replaces everything.
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
    override def readSchema(): StructType = table.schema()
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftInputPartition(table.rows))
    override def createReaderFactory(): PartitionReaderFactory =
      (partition: InputPartition) => {
        val rs = partition.asInstanceOf[GraftInputPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = rs(i)
          override def close(): Unit = ()
        }
      }
  }
}

/** Rows travel inside the partition — UnsafeRow is serializable. */
case class GraftInputPartition(rows: Array[InternalRow]) extends InputPartition

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
    GraftWriterFactory(writeSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = messages.flatMap(_.asInstanceOf[GraftCommitMessage].rows)
    // one volatile swap — readers see pre- or post-commit content, never a mix
    table.rows = if (replaceAll) written else table.rows ++ written
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class GraftCommitMessage(rows: Array[InternalRow]) extends WriterCommitMessage

case class GraftWriterFactory(writeSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Two layout quirks are handled here:
      //  1. incoming rows may be GenericInternalRows whose UTF8Strings
      //     point into REUSED reader buffers — a shallow copy() would
      //     store references that go stale, so every record is projected
      //     to a fresh UnsafeRow that owns its bytes;
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
      private val buf = scala.collection.mutable.ArrayBuffer[InternalRow]()
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
        }
        buf += proj(record).copy()
      }
      override def commit(): WriterCommitMessage = GraftCommitMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
