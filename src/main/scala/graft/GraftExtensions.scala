package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, JaroWinklerSimilarity, Md5MinHashSignature, UnicodeNormalize}

/** SparkSessionExtensions entry point — the engine's `install_extension`
  * analogue (postpy extensions.install_extension [unverified, SURVEY §0]):
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * registers the native functions so plain SQL can call them:
  * `SELECT cosine_similarity(embedding, probe) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (identifier, info, builder) triples — shared by the extensions path
    * and `register` (direct registry injection on a live session).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
     new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
     (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("jaro_winkler"),
     new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
     (children: Seq[Expression]) => JaroWinklerSimilarity(children(0), children(1))),
    (new FunctionIdentifier("minhash_md5"),
     new ExpressionInfo(classOf[Md5MinHashSignature].getName, "minhash_md5"),
     // SQL form: minhash_md5(shingle_array, k) — k must be an int literal
     // (it sizes the output schema, so it cannot be data-dependent)
     (children: Seq[Expression]) => Md5MinHashSignature(children(0),
       children(1) match {
         case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
         case other => throw new IllegalArgumentException(
           s"minhash_md5 k must be an INT literal, got $other")
       })),
    (new FunctionIdentifier("unicode_normalize"),
     new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
     // SQL form: unicode_normalize(s[, 'NFC'|'NFD'|'NFKC'|'NFKD']) — the
     // form literal selects the algorithm at plan time
     (children: Seq[Expression]) => UnicodeNormalize.fromArgs(children)))

  /** Register on an already-running session (spark.udf-style, but native —
    * the expression stays codegen-able, unlike a Scala UDF).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
