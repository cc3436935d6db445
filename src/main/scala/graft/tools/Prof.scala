package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev profiler: run one declared query against a data dir, print the
  * warmed wall time, DETERMINISTIC structure counters (jobs / stages /
  * tasks / shuffle bytes — immune to wall-clock noise, r12), and the
  * formatted physical plan.
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
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // let the async listener bus drain: poll until the counters are stable
    // across two 100 ms reads (a single fixed sleep undercounted on a
    // loaded machine — ADVICE r12), bounded at 5 s
    var prev = -1L
    var spins = 0
    while (prev != jobs.get.toLong + stages.get + tasks.get + shufRead.get && spins < 50) {
      prev = jobs.get.toLong + stages.get + tasks.get + shufRead.get
      Thread.sleep(100)
      spins += 1
    }
    println(f"[prof] $key: $wall%.3f s, $n rows, jobs=${jobs.get}, " +
      f"stages=${stages.get}, tasks=${tasks.get}, shuffleReadMB=${shufRead.get / 1e6}%.1f")
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
