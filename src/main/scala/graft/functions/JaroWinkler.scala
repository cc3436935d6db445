package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity — the fuzzy
  * string-matching verb of record linkage / entity resolution (the
  * Postgres fuzzystrmatch analogue; postpy users reach it in-database).
  *
  * Textbook definition over UTF-8 BYTES (DuckDB's comparison unit —
  * verified on supplementary-plane inputs), BIT-IDENTICAL to DuckDB
  * 1.0's jaro_winkler_similarity over the full corpus vocabulary pair
  * set and the non-BMP pinned cases in JaroWinklerSpec:
  * match window = max(len)/2 − 1; transpositions = half the out-of-order
  * matches; jaro = (m/l1 + m/l2 + (m−t)/m)/3; Winkler boost only above
  * 0.7: jw = j + min(prefix,4)·0.1·(1−j). Identical-ordered double
  * arithmetic both engines, so q_text_jaro declares it under the oracle
  * gate (round-6 on top).
  *
  * Codegen emits a call to the static [[JaroWinkler.compute]] — the
  * branchy two-pass match loop gains nothing from textual inlining, and
  * the static call keeps the expression inside whole-stage codegen (no
  * interpreted fallback, no boxing).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Static entry for both the interpreted eval and generated code.
    * Operates directly on the UTF-8 BYTES — DuckDB's
    * jaro_winkler_similarity is byte-based (verified on
    * supplementary-plane inputs: 'a💩b'↔'ab' = 0.5555…, the byte
    * interpretation, not the 0.6111… code-point one), and bytes also
    * avoid decoding the UTF8String at all.
    */
  def compute(a: UTF8String, b: UTF8String): Double =
    computeBytes(a.getBytes, b.getBytes)

  /** Test/reference entry on JVM strings (encodes to UTF-8 first). */
  def computeStr(s1: String, s2: String): Double =
    computeBytes(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                 s2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def computeBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes of s1 in order vs matched bytes of s2
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
