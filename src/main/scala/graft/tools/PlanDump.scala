package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` for declared keys to files —
  * the plans/rNN/<key>_{before,after}.txt optimization-round evidence.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <keyRegex> [sfDir]
  *   e.g. runMain graft.tools.PlanDump plans/r12 before '^q_(bfs_hops|pagerank)$'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keyRe = args(2).r
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => keyRe.findFirstIn(k).isDefined }
      .foreach { case (key, fn) =>
        try {
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${key}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plandump] wrote $key")
        } catch { case e: Throwable =>
          println(s"[plandump] $key ERROR ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
