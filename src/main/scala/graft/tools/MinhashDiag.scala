package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the dedup_minhash sf1 DNF: band-bucket
  * occupancy distribution and the implied pair-join volume.
  */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/scratch/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs: ${docs.count()}")
    val sig = graft.ops.MinHashDedup.signatures(docs, "doc_id", "text", 16)
    println(s"sigs: ${sig.count()}")
    val banded = sig.select(col("id"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> xxhash64(slice(sig, b * 4 + 1, 4)))"))
        .as(Seq("band", "bh")))
    val occ = banded.groupBy("band", "bh").count()
    occ.groupBy().agg(
      count(lit(1)).as("buckets"),
      max(col("count")).as("max_occ"),
      sum(col("count") * (col("count") - 1) / 2).as("pair_rows")).show(false)
    occ.orderBy(col("count").desc).show(10, false)
    spark.stop()
  }
}
