package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the portable 60-bit hash of EVERY stride-1
  * character window of length `w` — the per-document generator of the
  * substring-duplication profile (q_dedup_substring and its winnowed
  * scale form).
  *
  * Element i (0-based; window at character position i+1) is bit-identical
  * to the declarable SQL form both engines share:
  *
  *   cast(conv(substring(md5(substring(text, i+1, w)), 1, 15), 16, 10) as bigint)
  *   == ('0x' || substr(md5(substr(text, i+1, w)), 1, 15))::BIGINT   (DuckDB)
  *
  * i.e. the first 15 hex chars (60 bits) of the window's md5, as a
  * non-negative BIGINT. The fused loop never builds a substring, hex
  * string, or decimal string: character boundaries (code points — the
  * unit Spark's substring and DuckDB's substr agree on) are scanned once,
  * each window's bytes are digested in place, and the value is the first
  * 60 bits of the digest ((first 8 bytes big-endian) >>> 4). The HOF
  * form it replaces (transform(sequence) → md5 → conv, CodegenFallback)
  * paid a substring + 32-hex string + decimal-parse per character
  * position.
  *
  * Returns an empty array when the text has fewer than w characters
  * (callers filter length >= w anyway; an empty array keeps the
  * expression total, never the [1,0] trap of sequence(1, nonpositive)).
  */
case class Md5WindowHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_window_hashes"

  override def nullSafeEval(input: Any): Any =
    Md5WindowHashes.compute(input.asInstanceOf[UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5WindowHashes.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Md5WindowHashes =
    copy(child = newChild)
}

object Md5WindowHashes {

  private val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, w: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // code-point start offsets (a UTF-8 lead byte is any byte not matching
    // 10xxxxxx) — substring/substr count characters in both engines
    var nChars = 0
    var p = 0
    while (p < len) { if ((bytes(p) & 0xc0) != 0x80) nChars += 1; p += 1 }
    val nWindows = nChars - w + 1
    if (nWindows <= 0) return new GenericArrayData(Array.emptyLongArray)
    val charStart = new Array[Int](nChars + 1)
    var c = 0
    p = 0
    while (p < len) {
      if ((bytes(p) & 0xc0) != 0x80) { charStart(c) = p; c += 1 }
      p += 1
    }
    charStart(nChars) = len
    val out = new Array[Long](nWindows)
    val md = digestTL.get()
    var i = 0
    while (i < nWindows) {
      val from = charStart(i)
      val until = charStart(i + w)
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      // first 15 hex chars = first 60 bits: 8 big-endian bytes >>> 4
      out(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
                ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
                ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
                ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}
