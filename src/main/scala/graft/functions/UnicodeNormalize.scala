package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD)
  * — the canonical-form step every multilingual text pipeline needs
  * before hashing, dedup, or tokenization: visually-identical strings
  * built from different code-point sequences ('e'+U+0301 vs U+00E9)
  * otherwise hash apart and split token counts. Spark ships no
  * normalization function; a Scala UDF would serialize every row — this
  * expression stays inside whole-stage codegen via a static call (the
  * JaroWinkler pattern).
  *
  * The form is a LITERAL argument resolved once at plan time (it selects
  * the algorithm, so it cannot be data-dependent — the minhash_md5 k
  * rule). SQL surface: `unicode_normalize(s, 'NFC')` via GraftExtensions.
  *
  * Fast path: Normalizer.isNormalized is a cheap scan that avoids
  * allocating for the (overwhelmingly common) already-normalized case —
  * ASCII corpus text pays only the check.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalizer.normalize(s.asInstanceOf[UTF8String], form.name())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.UnicodeNormalizer.normalize($s, "${form.name()}");""")

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

object UnicodeNormalize {
  /** SQL-registration builder: second argument must be a string literal
    * naming the form; defaults to NFC when omitted.
    */
  def fromArgs(children: Seq[Expression]): UnicodeNormalize = children match {
    case Seq(c) => UnicodeNormalize(c, Normalizer.Form.NFC)
    case Seq(c, Literal(f: UTF8String, StringType)) =>
      UnicodeNormalize(c, Normalizer.Form.valueOf(f.toString.toUpperCase))
    case other => throw new IllegalArgumentException(
      "unicode_normalize(str[, 'NFC'|'NFD'|'NFKC'|'NFKD']) — form must be a string literal, got " +
        other.mkString(", "))
  }
}

object UnicodeNormalizer {
  /** Static entry shared by interpreted eval and generated code. The form
    * name→enum lookup is a static valueOf on a 4-value enum (JIT folds
    * it); isNormalized short-circuits the no-op case without allocating.
    */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val form = Normalizer.Form.valueOf(formName)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
