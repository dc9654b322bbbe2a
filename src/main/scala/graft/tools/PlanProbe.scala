package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dev probe: EXECUTE a graded query at a given sf dir and print the
  * final (post-AQE) plan's join/exchange/aggregate skeleton + timing.
  * Usage: graft.tools.PlanProbe <key> [sfDir] [n]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    var df = Registry.byKey(key).build(spark, dir)
    (1 to n).foreach { i =>
      df = Registry.byKey(key).build(spark, dir)
      val t0 = System.nanoTime()
      df.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => Seq("Join", "Exchange", "Aggregate", "TakeOrdered", "Window",
        "Sort", "FileScan").exists(l.contains))
      .mkString("\n"))
    spark.stop()
  }
}
