package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: runs named queries (warmup + timed
  * pass, the Bench methodology) with a listener that prints per-job
  * wall time and per-stage task-time/shuffle totals, so the expensive
  * stage inside a multi-job key is attributable without the UI.
  * Usage: runMain graft.Profile <sfDir> name1,name2,...
  */
object Profile {
  private final class L extends SparkListener {
    case class St(name: String, var taskTime: Long = 0L,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L,
                  var input: Long = 0L, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    @volatile var log: Boolean = false
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (log) jobs.put(j.jobId, (j.time,
        Option(j.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))).getOrElse("")))
    override def onJobEnd(j: SparkListenerJobEnd): Unit = if (log) {
      Option(jobs.get(j.jobId)).foreach { case (t0, desc) =>
        System.err.println(f"[prof]   job ${j.jobId}%4d ${(j.time - t0) / 1e3}%8.2f s  $desc")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = if (log) {
      val i = s.stageInfo
      val m = i.taskMetrics
      System.err.println(f"[prof]     stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
        f"taskTime=${m.executorRunTime / 1e3}%8.2f s " +
        f"gc=${m.jvmGCTime / 1e3}%6.2f s " +
        f"cpu=${m.executorCpuTime / 1e9}%7.2f s " +
        f"dser=${m.executorDeserializeTime / 1e3}%6.2f s " +
        f"in=${m.inputMetrics.bytesRead / 1e6}%8.1f MB " +
        f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f MB " +
        f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB  " +
        i.name.take(60))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup (JIT, codegen, memoized fixtures)
      try Par.scoped { fn(spark, sfDir).queryExecution.toRdd.count(); () }
      catch { case e: Throwable => System.err.println(s"[prof] warmup $name FAILED: $e") }
      graft.pipeline.DayReplay.reclaimStale()
      System.gc()
      l.log = true
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      l.log = false
      Par.release()
      graft.pipeline.DayReplay.reclaimStale()
      System.err.println(f"[prof] $name%-28s TOTAL $sec%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
