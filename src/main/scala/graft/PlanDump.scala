package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence dump: writes `explain("formatted")`
  * for the named queries (or every query) to `<outDir>/<name>_<tag>.txt`
  * so plan claims in OPTIMIZATION_r*.md are checkable without running
  * Spark. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <tag> [name1,name2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names: Set[String] =
      if (args.length > 3) args(3).split(",").toSet
      else SparkEntry.queries.keySet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names(n) }
      .foreach { case (name, fn) =>
        try {
          // Plan only — never execute. Streaming/stateful keys whose
          // builder RUNS a stream to produce the frame still execute
          // their scaffolding; for those the dumped plan is the final
          // read-back, which is what the graded timing forces too.
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
            txt.getBytes("UTF-8"))
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
        }
        Par.release()
      }
    spark.stop()
  }
}
