package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the dedup_simhash scale tail: true pair volume,
  * fingerprint distinctness, and the join's pre-dedup multiplicity
  * (how many block combinations each emitted pair collides on) —
  * separates collision-bound from output-bound regimes.
  */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/scratch/sf10"
    val blocks = if (args.length > 1) args(1).toInt else 0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val fp = graft.engine.Tables(spark, dir, "documents")
      .select($"doc_id",
        graft.engine.GraftFunctions.simhash64(spark, split($"text", " ")).as("fp"))
      .cache()
    println(s"docs=${fp.count()} distinct_fp=${fp.select("fp").distinct().count()}")
    val t0 = System.nanoTime()
    val pairs = graft.ops.HammingJoin.pairsWithin(fp, "doc_id", "fp", 6, blocks)
    println(s"pairs_within_6=${pairs.count()} (blocks=$blocks) " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
