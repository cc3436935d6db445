package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BoundReference, EqualNullSafe, Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Write-time CHECK constraints — the `CREATE TABLE … CHECK (expr)` DQ
  * gate postpy's DDL layer compiles for Postgres, enforced here by the
  * table format itself: any table property `check.<name> = '<sql>'`
  * (set at CREATE or via ALTER TABLE SET TBLPROPERTIES) is compiled once
  * per write and evaluated against every incoming row; a violating row
  * fails the TASK, the write aborts, and the commit never happens — the
  * table is untouched (pinned in CheckConstraintSpec).
  *
  * SQL semantics: a CHECK passes on TRUE **and on NULL** (unknown) —
  * only a definite FALSE violates, exactly the SQL-standard rule. The
  * violation test is therefore `cond <=> false`, not `NOT cond`.
  *
  * Compilation happens DRIVER-SIDE through the real analyzer (a filter
  * over an empty frame of the write schema), so name resolution and
  * implicit type coercion behave exactly as in a query; the resolved
  * expression is then bound to write-schema positions and shipped to
  * executors, where it evaluates per-row with codegen (Predicate.create)
  * — no per-row SQL, no driver round-trips.
  */
object CheckConstraints {

  val PREFIX = "check."

  /** Compile every `check.*` property against `schema`. Fails loudly on
    * parse/resolution errors and on non-boolean expressions — at write
    * time, and via [[validate]] at ALTER time.
    */
  def compile(spark: SparkSession, props: Map[String, String],
              schema: StructType): Seq[(String, Expression)] =
    props.toSeq.filter(_._1.startsWith(PREFIX)).sortBy(_._1).map { case (k, sql) =>
      val name = k.stripPrefix(PREFIX)
      val analyzed =
        try {
          val df = spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
            .filter(org.apache.spark.sql.functions.expr(sql))
          df.queryExecution.analyzed match {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
            case other => throw new IllegalArgumentException(
              s"unexpected plan ${other.getClass.getSimpleName}")
          }
        } catch {
          case e: Exception => throw new IllegalArgumentException(
            s"CHECK constraint '$name' ($sql) does not compile against " +
            s"schema ${schema.simpleString}: ${e.getMessage}", e)
        }
      require(analyzed.dataType == BooleanType,
        s"CHECK constraint '$name' ($sql) is ${analyzed.dataType.simpleString}, not BOOLEAN")
      // a nondeterministic CHECK (rand() < 0.5) is semantically meaningless
      // — the "same" row would pass or fail by luck — and its Predicate
      // would need per-partition initialization; reject at compile/ALTER
      // time with a clear message instead of an obscure writer-side error
      require(analyzed.deterministic,
        s"CHECK constraint '$name' ($sql) is nondeterministic — a check " +
        "must give the same verdict for the same row every time")
      // bind by NAME to write-schema positions: the bound tree is what
      // ships to executors (serializable, codegen-able)
      val bound = analyzed.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          BoundReference(schema.fieldIndex(a.name), a.dataType, a.nullable)
      }
      // SQL rule: violation iff definitively FALSE (NULL passes)
      name -> EqualNullSafe(bound, Literal(false, BooleanType))
    }

  /** ALTER-time validation: a bad expression must fail the SET, not the
    * next write.
    */
  def validate(spark: SparkSession, props: Map[String, String], schema: StructType): Unit =
    compile(spark, props, schema)
}
