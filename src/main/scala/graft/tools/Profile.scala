package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Tables
import graft.ops.MinHashDedup

/** Dev profiling entry: stage-level timings for the heavier ops.
  * Usage: graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label")
      r
    }

    val docs = Tables(spark, dir, "documents")
    docs.count()
    time("minhash signatures")(
      MinHashDedup.signatures(docs, "doc_id", "text", 16).count())
    time("minhash candidatePairs") {
      val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text", 16, 4)
      println("  pairs: " + cands.count())
      val plan = cands.queryExecution.executedPlan.toString
      println("  reused exchanges: " + "ReusedExchange|ReusedQueryStage|TableCacheQueryStage".r
        .findAllIn(plan).length)
      println("  exchanges: " + "Exchange".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
