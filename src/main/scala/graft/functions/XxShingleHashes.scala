package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SORTED DISTINCT xxhash64 values of a
  * text's w-token shingles in one fused pass — the hashed-shingle-set
  * generator of the exact-Jaccard dedup family (prefix filtering /
  * all-pairs ground truth).
  *
  * Value-identical to `array_distinct(shingles(text, w))` followed by
  * per-element `xxhash64(...)` (Spark's XXH64, seed 42, over the shingle's
  * UTF-8 bytes — shingles are byte spans of the source text, so the hash
  * is computed IN PLACE with zero shingle strings built). Distinctness is
  * taken over the hashes rather than the strings: indistinguishable
  * downstream absent a 64-bit collision — the same accepted risk the
  * hashed Jaccard join itself documents — and every consumer treats the
  * array as a SET (size, explode, intersect size), so the sorted order is
  * unobservable. Sort+dedup in a primitive array: no boxing, no hash-set
  * allocation churn.
  *
  * Returns an empty array when the text has fewer than w tokens; NULL on
  * NULL input.
  */
case class XxShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xx_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    XxShingleHashes.compute(input.asInstanceOf[UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.XxShingleHashes.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): XxShingleHashes =
    copy(child = newChild)
}

object XxShingleHashes {

  /** Spark's xxhash64 default seed. */
  val SEED = 42L

  def compute(text: UTF8String, w: Int): ArrayData = {
    // CJK unigram rewrite first (CjkFold — byte twin of Text.tokens'
    // regexp), so the byte-span identity holds for space-free scripts too
    val bytes = CjkFold.normalize(text.getBytes)
    val len = bytes.length
    var nTokens = 1
    var p = 0
    while (p < len) { if (bytes(p) == ' ') nTokens += 1; p += 1 }
    if (nTokens < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' ') { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(nTokens) = len + 1 // end of token i = starts(i+1) - 1
    val nShingles = nTokens - w + 1
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val from = starts(i)
      val until = starts(i + w) - 1 // w tokens + their w-1 separators, verbatim
      hs(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
                                    until - from, SEED)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var m = 0
    i = 0
    while (i < nShingles) {
      if (m == 0 || hs(i) != hs(m - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nShingles) hs else java.util.Arrays.copyOf(hs, m))
  }
}
