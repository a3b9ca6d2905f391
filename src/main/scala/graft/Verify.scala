package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    // SPARK_GRAFT_ONLY=name1,name2 restricts the dump (dev iteration;
    // the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Failures must be LOUD (r10 verdict): a query that throws gets a
    // per-query _ERROR.txt sentinel (an output dir with no parquet →
    // check_oracle.py reports FAIL, not a silent gap) and lands in the
    // _failures.json manifest alongside the attempted-key count, so
    // the dump can never silently shrink below SparkEntry.queries.
    val failed = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val attempted = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failed += ((name, msg))
        val d = Paths.get(s"$outDir/$name")
        Files.createDirectories(d)
        Files.writeString(d.resolve("_ERROR.txt"), msg)
      }
      Par.release()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val manifest =
      s"""{"attempted": ${attempted.size}, "failed": ${
        failed.map { case (n, m) => s"${q(n)}: ${q(m)}" }
          .mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/_failures.json"), manifest)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${attempted.size} queries FAILED: " +
          failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
