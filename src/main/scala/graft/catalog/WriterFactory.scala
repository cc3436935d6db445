package graft.catalog

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** Task-side group-file writer. Two layout quirks are handled here:
  *  1. incoming rows may be GenericInternalRows whose UTF8Strings point
  *     into REUSED reader buffers — every record is projected to a fresh
  *     UnsafeRow so the serialized bytes are self-owned;
  *  2. Spark's group-based row-level rewrites (MERGE/UPDATE/DELETE →
  *     ReplaceData) PREPEND an internal operation column to the query
  *     output, and when the operation declares no metadata columns the
  *     plain writing task hands the row over without applying
  *     ReplaceDataProjections.rowProjection — so the table columns sit at
  *     offset 1. Detected from the first record's width; the op value is
  *     a constant marker for group-based writes (all emitted rows are
  *     keepers), so only position matters.
  *
  * Bucketed tables (`bucketed = Some((colIdx, numBuckets))`) route every
  * row to a PER-BUCKET group file using the same pmod rule as
  * [[GraftBucketFunction]] (nulls to bucket 0) and tag each emitted Group
  * with its bucket id. The write-side clustered distribution means a task
  * normally sees one bucket; the routing map is the correctness backstop
  * when it doesn't (unshuffled small inserts, distribution disabled).
  */
case class GraftWriterFactory(location: String, writeSchema: StructType,
                              bucketed: Option[(Int, Int)] = None,
                              fieldIds: Seq[Int] = Seq.empty)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // one open group file + its pruning stats
      private class FileSink(val bucket: Option[Int]) {
        val fileName = f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.rows"
        val tmpPath = Paths.get(location).resolve(fileName + ".tmp")
        val finalPath = Paths.get(location).resolve(fileName)
        val out = new DataOutputStream(new BufferedOutputStream(
          Files.newOutputStream(tmpPath)))
        out.writeInt(writeSchema.length)
        val mins = Array.fill(longCols.length)(Long.MaxValue)
        val maxs = Array.fill(longCols.length)(Long.MinValue)
        val nonNulls = Array.fill(longCols.length)(0L)
        // bloom per long column, keyed by STABLE FIELD ID (or position
        // when the table predates field ids) — the equality-pruning
        // complement to the (min,max) range stats
        val blooms = Array.fill(longCols.length)(new GroupBloom.Builder)
        var nRows = 0L

        def write(u: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Unit = {
          var s = 0
          while (s < longCols.length) {
            val i = longCols(s)
            if (!u.isNullAt(i)) {
              val v = u.getLong(i)
              if (v < mins(s)) mins(s) = v
              if (v > maxs(s)) maxs(s) = v
              nonNulls(s) += 1
              blooms(s).add(v)
            }
            s += 1
          }
          out.writeInt(u.getSizeInBytes)
          u.writeToStream(out, copyBuffer)
          nRows += 1
        }

        def seal(): Group = {
          out.close()
          Files.move(tmpPath, finalPath, StandardCopyOption.ATOMIC_MOVE)
          if (longCols.nonEmpty && nRows > 0)
            GroupBloom.write(finalPath.resolveSibling(fileName + ".bloom"),
              longCols.indices.map { s =>
                val id = if (fieldIds.nonEmpty) fieldIds(longCols(s)) else longCols(s)
                id -> blooms(s).result()
              })
          val stats = longCols.indices.flatMap { s =>
            if (mins(s) <= maxs(s))
              Some(writeSchema.fields(longCols(s)).name -> (mins(s), maxs(s)))
            else None // all-null column: no stats
          }.toMap
          val nn = longCols.indices.flatMap { s =>
            if (mins(s) <= maxs(s))
              Some(writeSchema.fields(longCols(s)).name -> nonNulls(s))
            else None
          }.toMap
          Group(fileName, stats, Some(nRows), nn, bucket,
                // files permanently record the field ids they were
                // written under — the identity that keeps them readable
                // across later RENAME/DROP COLUMN
                if (fieldIds.nonEmpty) Some(fieldIds) else None,
                // size recorded once here so planning never stats files
                deletes = None, bytes = Some(Files.size(finalPath)),
                bloom = longCols.nonEmpty && nRows > 0)
        }

        def drop(): Unit = {
          out.close()
          Files.deleteIfExists(tmpPath); Files.deleteIfExists(finalPath)
          Files.deleteIfExists(finalPath.resolveSibling(fileName + ".bloom"))
          Files.deleteIfExists(finalPath.resolveSibling(fileName + ".bloom.tmp"))
        }
      }

      private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
      private val copyBuffer = new Array[Byte](8192) // for off-heap-backed rows
      // per-file min/max pruning stats for the long-typed columns
      private val longCols = writeSchema.fields.zipWithIndex
        .filter(_._1.dataType == org.apache.spark.sql.types.LongType).map(_._2)
      private val sinks = scala.collection.mutable.LinkedHashMap.empty[Int, FileSink]
      // hot-path cache: unbucketed writes always hit one sink, and the
      // clustered write distribution makes long same-bucket runs the norm
      // for bucketed ones — skip the map lookup for the common row
      private var lastBucket = Int.MinValue
      private var lastSink: FileSink = _

      private def sinkFor(u: org.apache.spark.sql.catalyst.expressions.UnsafeRow): FileSink = {
        val b = bucketed match {
          case None => 0
          case Some((idx, n)) =>
            if (u.isNullAt(idx)) 0 else GraftBucketFunction.bucketOf(u.getLong(idx), n)
        }
        if (b != lastBucket) {
          lastSink = sinks.getOrElseUpdate(b,
            new FileSink(bucketed.map(_ => b)))
          lastBucket = b
        }
        lastSink
      }

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
        val u = proj(record) // projection output is reused — serialize now
        sinkFor(u).write(u)
      }

      override def commit(): WriterCommitMessage =
        GraftCommitMessage(sinks.values.map(_.seal()).toSeq) // empty task: no file at all

      override def abort(): Unit = sinks.values.foreach(_.drop())
      override def close(): Unit = ()
    }
}
