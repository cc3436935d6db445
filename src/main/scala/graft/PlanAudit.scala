package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: explain every declared query at the given SF and flag plan
  * smells (cartesian products, unpruned scans, unexpected broadcasts of
  * large inputs). Not part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> p.contains("BroadcastNestedLoopJoin"),
          "fullScanNoPrune" -> {
            // a lineitem ReadSchema carrying join keys AND money AND date
            // columns together means pruning failed — no declared query
            // legitimately needs that combination in one scan
            p.linesIterator.exists(l => l.contains("ReadSchema") &&
              Seq("l_partkey", "l_suppkey", "l_tax", "l_shipdate").forall(l.contains))
          },
        ).collect { case (f, true) => f }
        val scans = p.linesIterator.count(_.contains("Scan parquet"))
        println(f"$name%-26s scans=$scans%-3d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
