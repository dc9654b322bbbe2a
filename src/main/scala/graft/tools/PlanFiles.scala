package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-key `explain("formatted")` dumps for the optimization-round
  * before/after evidence: one `<outDir>/<key><suffix>.txt` per key.
  * Usage: graft.tools.PlanFiles <sfDir> <outDir> <suffix> <k1,k2,...>
  * (run once from the round-start commit with suffix `_before` and once
  * from HEAD with `_after`; the same session conf as Bench so plan
  * shapes match what the bench times).
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, keyCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keyCsv.split(",").foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, dir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$k$suffix.txt"), formatted)
        println(s"wrote $outDir/$k$suffix.txt")
      } catch {
        case t: Throwable =>
          println(s"FAILED $k: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
