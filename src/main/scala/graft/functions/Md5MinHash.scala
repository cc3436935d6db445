package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-PORTABLE md5 MinHash signature
  * in one fused pass (SURVEY §2 I; the scale dedup sketch).
  *
  * Semantics are BIT-IDENTICAL to the higher-order formulation it
  * replaces (MinHash.md5Hashes → md5SignatureFromHashes, kept as the
  * property-test reference): component i over shingles s is
  *
  *   min_s substring(concat_g md5(g ++ ":" ++ s), i*8 + 1, 8)
  *
  * i.e. the lexicographic minimum of an 8-lowercase-hex-char window of
  * the concatenated group digests (g = i/4 — each md5 yields four 32-bit
  * components). Two exact identities make the fused loop cheap:
  *
  *  - the hex window [i*8, i*8+8) of the concatenation is exactly bytes
  *    [4·(i%4), 4·(i%4)+4) of digest i/4 — no hex string is ever built
  *    per shingle;
  *  - lexicographic order of fixed-width lowercase-hex strings equals
  *    unsigned numeric order of the 32-bit values they encode — so the
  *    running minima are int compares, and only the k winners are
  *    hex-encoded at the end.
  *
  * The HOF chain was CodegenFallback (lambda closures, per-element
  * boxing, a 32·ceil(k/4)-char intermediate string per shingle); this
  * expression is a tight JVM loop entered from whole-stage codegen via a
  * static call (the JaroWinkler pattern — the branchy digest loop gains
  * nothing from textual inlining).
  *
  * NULL semantics match the HOF form: null input array → null; null
  * elements are skipped (array_min skips the nulls that md5(null)
  * propagates); an empty / all-null array yields an array of k nulls
  * (array_min of empty = null per component).
  */
case class Md5MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5"

  override def nullSafeEval(input: Any): Any =
    Md5MinHash.signature(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5MinHash.signature($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSignature =
    copy(child = newChild)
}

/** Fully fused form: text → tokens → w-shingles → md5 MinHash signature in
  * one pass, NULL when the text has fewer than w tokens (the
  * `filter(size(ss) > 0)` guard of the staged form becomes
  * `filter(sig.isNotNull)`).
  *
  * Key identity: `Text.shingles` joins w consecutive `split(text, " ")`
  * tokens with a single space — and since the tokens were delimited by
  * single spaces in the source, every shingle is EXACTLY a byte span of
  * the original text (empty tokens from space runs included). So the
  * fused pass scans the UTF-8 bytes once for space positions and digests
  * spans in place: no token array, no shingle strings, no distinct pass
  * (duplicate shingles cannot change a min). Output is bit-identical to
  * md5Signature(array_distinct(shingles(text, w)), k) — property-tested.
  */
case class Md5MinHashFromText(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  require(w >= 1 && k >= 1, s"need w >= 1 and k >= 1, got w=$w k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5_text"

  override def nullSafeEval(input: Any): Any =
    Md5MinHash.signatureFromText(input.asInstanceOf[UTF8String], w, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.Md5MinHash.signatureFromText($a, $w, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashFromText =
    copy(child = newChild)
}

object Md5MinHash {

  private val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val hexChars: Array[Byte] =
    "0123456789abcdef".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** 8-lowercase-hex-char UTF8String of an unsigned 32-bit value. */
  private def hex8(v: Long): UTF8String = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      b(i) = hexChars(((v >>> ((7 - i) * 4)) & 0xfL).toInt)
      i += 1
    }
    UTF8String.fromBytes(b)
  }

  /** Static entry for both interpreted eval and generated code.
    * Returns ArrayData of k 8-hex-char strings (or k nulls when the
    * input has no non-null element).
    */
  def signature(arr: ArrayData, k: Int): ArrayData = {
    val groups = (k + 3) / 4
    // one prefix byte-array per md5 group: "0:", "1:", …
    val prefixes = new Array[Array[Byte]](groups)
    var g = 0
    while (g < groups) {
      prefixes(g) = (g.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      g += 1
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digestTL.get()
    val n = arr.numElements()
    var any = false
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        any = true
        val sBytes = arr.getUTF8String(e).getBytes
        g = 0
        while (g < groups) {
          md.reset()
          md.update(prefixes(g))
          md.update(sBytes)
          val d = md.digest()
          val base = g * 4
          var j = 0
          while (j < 4 && base + j < k) {
            val o = j * 4
            val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
                    ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
            if (v < mins(base + j)) mins(base + j) = v
            j += 1
          }
          g += 1
        }
      }
      e += 1
    }
    val out = new Array[Any](k)
    if (any) {
      var i = 0
      while (i < k) { out(i) = hex8(mins(i)); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Fused text → signature (see [[Md5MinHashFromText]]): digests the
    * w-token byte spans of `text` directly. Returns null when the text has
    * fewer than w tokens (no shingle exists).
    */
  def signatureFromText(text: UTF8String, w: Int, k: Int): ArrayData = {
    // CJK unigram rewrite first (CjkFold — byte twin of Text.tokens'
    // regexp), so the byte-span identity holds for space-free scripts too
    val bytes = CjkFold.normalize(text.getBytes)
    val len = bytes.length
    // token start offsets: 0 and every position after a 0x20 byte (UTF-8
    // multi-byte sequences never contain 0x20, so byte split == string
    // split on " "; empty tokens from space runs are kept, as split does)
    var nTokens = 1
    var p = 0
    while (p < len) { if (bytes(p) == ' ') nTokens += 1; p += 1 }
    if (nTokens < w) return null
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' ') { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(nTokens) = len + 1 // sentinel: end of token i is starts(i+1) - 1
    val groups = (k + 3) / 4
    val prefixes = new Array[Array[Byte]](groups)
    var g = 0
    while (g < groups) {
      prefixes(g) = (g.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      g += 1
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digestTL.get()
    var i = 0
    val nShingles = nTokens - w + 1
    while (i < nShingles) {
      // shingle i = bytes [starts(i), starts(i+w) - 2] — the w tokens and
      // the w-1 single-space separators between them, verbatim
      val from = starts(i)
      val until = starts(i + w) - 1
      g = 0
      while (g < groups) {
        md.reset()
        md.update(prefixes(g))
        md.update(bytes, from, until - from)
        val d = md.digest()
        val base = g * 4
        var j = 0
        while (j < 4 && base + j < k) {
          val o = j * 4
          val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
                  ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
          if (v < mins(base + j)) mins(base + j) = v
          j += 1
        }
        g += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) { out(c) = hex8(mins(c)); c += 1 }
    new GenericArrayData(out)
  }
}
