package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class TypedModelSpec extends AnyFunSuite with SparkFixture {
  test("typed Dataset surface: encoder roundtrip and pushdown-preserving filters") {
    val ds = graft.model.Typed.documents(spark, sfDir)
    val en = graft.model.Typed.inLanguage(ds, "en")
    val first = en.head()
    assert(first.lang === "en" && first.text.nonEmpty) // typed access
    // Column predicate reaches the parquet scan as a pushed filter
    val p = en.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("lang"), s"no pushdown:\n$p")
    val gated = graft.model.Typed.withMinChars(en, 100L)
    assert(gated.collect().forall(d => d.n_chars >= 100L && d.lang == "en"))
  }
}

/** Statement-equality tests — direct homage to the reference's DDL
  * compiler tests (postpy tests/test_ddl.py asserting exact SQL strings
  * [unverified, SURVEY §0/§5.1]).
  */
class ModelSpec extends AnyFunSuite {

  test("compile CREATE TABLE with PK") {
    val t = Table("customer",
      Seq(Column("c_custkey", LongType, nullable = false),
          Column("c_name", StringType),
          Column("c_acctbal", DecimalType(18, 2))),
      Some(PrimaryKey(Seq("c_custkey"))), schema = Some("main"))
    assert(t.qualifiedName === "main.customer")
    assert(t.createStatement ===
      """CREATE TABLE IF NOT EXISTS main.customer (
        |  c_custkey BIGINT NOT NULL,
        |  c_name STRING,
        |  c_acctbal DECIMAL(18,2)
        |) USING parquet
        |TBLPROPERTIES ('primary_key' = 'c_custkey')""".stripMargin)
    assert(t.dropStatement === "DROP TABLE IF EXISTS main.customer")
  }

  test("database DDL") {
    assert(Database("graft").createStatement === "CREATE DATABASE IF NOT EXISTS graft")
    assert(Database("graft").dropStatement === "DROP DATABASE IF EXISTS graft CASCADE")
  }

  test("type mapping covers nested types") {
    assert(Model.sqlType(ArrayType(FloatType)) === "ARRAY<FLOAT>")
    assert(Model.sqlType(MapType(StringType, StringType)) === "MAP<STRING,STRING>")
    assert(Model.sqlType(StructType(Seq(StructField("a", IntegerType)))) === "STRUCT<a:INT>")
  }

  test("fromStruct roundtrips the schema") {
    val t = Model.fromStruct("lineitem", graft.model.Schemas.lineitem,
      Model.primaryKeys("lineitem"))
    assert(t.structType === graft.model.Schemas.lineitem)
    assert(t.primaryKey.get.columnNames === Seq("l_orderkey", "l_linenumber"))
  }

  test("jdbc options built from PG-style env (connections.connect analogue)") {
    val opts = graft.io.Sources.jdbcOptions(
      Map("PGHOST" -> "db.example", "PGDATABASE" -> "prod", "PGUSER" -> "u", "PGPASSWORD" -> "p"),
      "public.customer")
    assert(opts("url") === "jdbc:postgresql://db.example:5432/prod")
    assert(opts("dbtable") === "public.customer")
    assert(opts("user") === "u")
  }


}
