package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, JaroWinklerSimilarity}

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
     (children: Seq[Expression]) => JaroWinklerSimilarity(children(0), children(1))))

  /** Register on an already-running session (spark.udf-style, but native —
    * the expression stays codegen-able, unlike a Scala UDF).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
