package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 SQL-defined functions (CREATE FUNCTION … RETURN) — the
  * in-database function surface a PostgreSQL user expects from
  * CREATE FUNCTION … LANGUAGE SQL (postpy installs server-side function
  * packages via CREATE EXTENSION; SQL UDFs are the engine-native way a
  * user ships the same reusable logic). Scalar and table-valued forms,
  * both resolved at plan time (the body inlines into the query plan, so
  * a SQL UDF costs nothing at runtime — unlike an opaque JVM UDF).
  */
class SqlUdfSpec extends AnyFunSuite with SparkFixture {

  test("scalar SQL UDF: declared, inlined into plans, composable") {
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS disc_price")
    // the declared return type must carry the product's full scale —
    // RETURNS DECIMAL(18,2) would round EVERY row to 2 dp before the sum
    spark.sql(
      """CREATE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        |RETURNS DECIMAL(22,4)
        |RETURN CAST(p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))
        |""".stripMargin)
    graft.io.Sources.lineitem(spark, sfDir).createOrReplaceTempView("li_udf")
    val viaUdf = spark.sql(
      """SELECT l_returnflag, CAST(SUM(disc_price(l_extendedprice, l_discount)) AS DOUBLE) AS s
        |FROM li_udf GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val direct = spark.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS s
        |FROM li_udf GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(viaUdf.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
           direct.map(r => (r.getString(0), r.getDouble(1))).toSeq)
    // the body INLINES: no BatchEvalPython/Invoke, plain decimal arithmetic
    val p = spark.sql("SELECT disc_price(l_extendedprice, l_discount) FROM li_udf")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Invoke"), "SQL UDF must inline, not call out")
    // composes with itself and other functions
    val x = spark.sql("SELECT CAST(disc_price(100.0, 0.1) + disc_price(10.0, 0.0) AS DOUBLE)")
      .collect()(0).getDouble(0)
    assert(math.abs(x - 100.0) < 1e-9)
  }

  test("table-valued SQL UDF: parameterized relation, joinable") {
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS top_orders")
    // a parameter is not foldable, so it cannot feed LIMIT — the
    // parameterized top-k spells as a rank filter instead
    spark.sql(s"""
      CREATE TEMPORARY FUNCTION top_orders(lim INT)
      RETURNS TABLE (o_orderkey BIGINT, o_totalprice DOUBLE)
      RETURN SELECT o_orderkey, o_totalprice FROM (
        SELECT o_orderkey, o_totalprice,
          row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM parquet.`$sfDir/orders.parquet`) WHERE rn <= lim""")
    val top5 = spark.sql("SELECT * FROM top_orders(5)").collect()
    assert(top5.length === 5)
    assert(top5.map(_.getDouble(1)).toSeq === top5.map(_.getDouble(1)).sorted.reverse.toSeq)
    // parameter actually parameterizes
    assert(spark.sql("SELECT * FROM top_orders(17)").count() === 17)
    // joinable like any relation
    val joined = spark.sql(s"""
      SELECT COUNT(*) FROM top_orders(10) t
      JOIN parquet.`$sfDir/lineitem.parquet` l ON l.l_orderkey = t.o_orderkey""")
      .collect()(0).getLong(0)
    assert(joined > 0)
  }

  test("SQL UDF with NULL handling and a DEFAULT parameter value") {
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS safe_ratio")
    spark.sql(
      """CREATE TEMPORARY FUNCTION safe_ratio(a DOUBLE, b DOUBLE DEFAULT 100.0)
        |RETURNS DOUBLE
        |RETURN CASE WHEN b = 0 THEN NULL ELSE a / b END""".stripMargin)
    val r = spark.sql(
      "SELECT safe_ratio(50.0), safe_ratio(50.0, 200.0), safe_ratio(1.0, 0.0)").collect()(0)
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 0.25)
    assert(r.isNullAt(2))
  }
}
