package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Model, Schemas}

/** Executable-DDL + reflection roundtrip (postpy admin.* analogue):
  * create via the compiled statement, reflect via spark.catalog, drop.
  */
class CatalogSpec extends AnyFunSuite with SparkFixture {

  test("compiled CREATE TABLE executes; catalog reflects it back; DROP cleans up") {
    val t = Model.fromStruct("graft_ddl_rt", Schemas.customer, Model.primaryKeys("customer"))
    spark.sql(t.dropStatement)
    spark.sql(t.createStatement)
    try {
      assert(spark.catalog.tableExists("graft_ddl_rt"))
      val cols = spark.catalog.listColumns("graft_ddl_rt").collect()
      assert(cols.map(_.name).toSeq === Schemas.customer.map(_.name))
      // PK survives the catalog roundtrip via table properties
      val props = spark.sql("SHOW TBLPROPERTIES graft_ddl_rt").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("primary_key").contains("c_custkey"))
    } finally spark.sql(t.dropStatement)
    assert(!spark.catalog.tableExists("graft_ddl_rt"))
  }

  test("listTables exposes temp views (reflection surface)") {
    spark.range(3).createOrReplaceTempView("graft_reflect_v")
    assert(spark.catalog.listTables().collect().exists(_.name == "graft_reflect_v"))
    spark.catalog.dropTempView("graft_reflect_v")
  }
}
