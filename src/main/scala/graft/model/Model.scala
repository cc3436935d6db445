package graft.model

import org.apache.spark.sql.types._

/** Relational table model + DDL compilation — the analogue of the
  * reference's value classes and DDL compilers (postpy base.Database/
  * Schema/Table/Column/PrimaryKey and ddl.compile_create_table /
  * compile_column / compile_primary_key — all [unverified], SURVEY.md §0/§1).
  *
  * Spark has no engine-enforced primary keys; the PK is carried as model
  * metadata and consumed by the merge/upsert/delete operators (ops.Merge)
  * as the conflict target — exactly the role it plays in the reference's
  * ON CONFLICT clauses.
  */
final case class Column(name: String, dataType: DataType, nullable: Boolean = true) {
  def ddl: String = {
    val n = if (nullable) "" else " NOT NULL"
    s"$name ${Model.sqlType(dataType)}$n"
  }
  def toField: StructField = StructField(name, dataType, nullable)
}

final case class PrimaryKey(columnNames: Seq[String]) {
  def ddl: String = s"PRIMARY KEY (${columnNames.mkString(", ")})"
}

final case class Table(
    name: String,
    columns: Seq[Column],
    primaryKey: Option[PrimaryKey] = None,
    schema: Option[String] = None) {

  def qualifiedName: String = schema.map(s => s"$s.$name").getOrElse(name)

  def structType: StructType = StructType(columns.map(_.toField))

  /** CREATE TABLE statement, executable by spark.sql. Spark DDL has no
    * engine-enforced PK constraint, so the PK is carried as a table
    * property (informational — consumed back by `Model.pkFromProperties`
    * and the merge operators).
    */
  def createStatement: String = {
    val body = columns.map(_.ddl).mkString(",\n  ")
    val props = primaryKey
      .map(pk => s"\nTBLPROPERTIES ('primary_key' = '${pk.columnNames.mkString(",")}')")
      .getOrElse("")
    s"CREATE TABLE IF NOT EXISTS $qualifiedName (\n  $body\n) USING parquet$props"
  }

  def dropStatement: String = s"DROP TABLE IF EXISTS $qualifiedName"
}

final case class Database(name: String) {
  def createStatement: String = s"CREATE DATABASE IF NOT EXISTS $name"
  def dropStatement: String = s"DROP DATABASE IF EXISTS $name CASCADE"
}

object Model {
  /** Spark DataType → SQL DDL type name (the data_types registry analogue). */
  def sqlType(dt: DataType): String = dt match {
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "STRING"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"ARRAY<${sqlType(e)}>"
    case MapType(k, v, _) => s"MAP<${sqlType(k)},${sqlType(v)}>"
    case s: StructType =>
      s"STRUCT<${s.fields.map(f => s"${f.name}:${sqlType(f.dataType)}").mkString(",")}>"
    case other => other.sql
  }

  /** Build a Table model from a StructType (reflection direction —
    * admin.get_column_metadata analogue over a live DataFrame).
    */
  def fromStruct(name: String, st: StructType, pk: Seq[String] = Nil): Table =
    Table(name, st.fields.toSeq.map(f => Column(f.name, f.dataType, f.nullable)),
          if (pk.nonEmpty) Some(PrimaryKey(pk)) else None)

  /** Declared (logical) PKs for the test tables — consumed by merge
    * operators as conflict targets. NB: the synthetic generator does NOT
    * enforce uniqueness for lineitem's composite key; delete/upsert
    * semantics are defined over "all rows matching the key", which is
    * well-defined either way.
    */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )
}
