package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed Dataset surface (SURVEY §1.1: `Dataset[T]` where type safety
  * helps — user-facing pipeline code; `DataFrame` everywhere schemas are
  * dynamic).
  *
  * The case classes mirror the test-table schemas (FIXTURES.md). The
  * combinators below deliberately take COLUMN predicates, not Scala
  * lambdas: a typed lambda (`_.lang == "en"`) compiles to an opaque
  * deserialize→invoke→serialize stage that blocks predicate pushdown and
  * whole-stage codegen — the worst of both worlds at 100 TB. Column
  * expressions keep the typed view AND the optimizer.
  */
final case class Document(doc_id: Long, text: String, lang: String,
                          source: String, n_chars: Long)

final case class EmbeddingRow(vec_id: Long, embedding: Seq[Float], label: Int)

object Typed {

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    graft.io.Sources.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[EmbeddingRow] = {
    import spark.implicits._
    graft.io.Sources.embeddings(spark, dir).as[EmbeddingRow]
  }

  /** Typed filter that keeps pushdown: the predicate is a Column, the
    * result is still Dataset[Document].
    */
  def inLanguage(ds: Dataset[Document], lang: String): Dataset[Document] =
    ds.filter(col("lang") === lang)

  /** Typed length gate — same Column-predicate discipline. */
  def withMinChars(ds: Dataset[Document], n: Long): Dataset[Document] =
    ds.filter(col("n_chars") >= n)
}
