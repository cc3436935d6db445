package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one declared query against a data dir, print the
  * warmed wall time and the formatted physical plan.
  *
  * Usage: runMain graft.tools.Prof <key> <sfDir> [cpus]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = args(1)
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    fn(spark, dir).count() // warm: JIT + codegen + footer caches
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(f"[prof] $key: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
