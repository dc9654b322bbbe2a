package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev probe: does the recursive half-word pigeonhole actually run at
  * a corpus size where the flat combination index DNFs?
  * Usage: graft.tools.HalvedProbe <sfDir>
  */
object HalvedProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/scratch/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fp = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.engine.GraftFunctions.simhash64(spark, split(col("text"), " ")).as("fp"))
    val nDocs = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    val k = graft.ops.HammingJoin.provisionBlocks(nDocs, 3,
      pairsPerDoc = 11.3, width = 32)
    println(s"n=$nDocs provisioned half-k=$k")
    val t0 = System.nanoTime()
    val n = graft.ops.HammingJoin
      .pairsWithinHalved(fp, "doc_id", "fp", maxDist = 6, blocksPerHalf = k)
      .count()
    println(f"halved pairs=$n%d in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
