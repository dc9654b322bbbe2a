package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-scale probe for dedup_cluster's 100 TB story (VERDICT r8 #6):
  * the graded key caps the corpus at doc_id < 1000 (the exact-Jaccard
  * oracle is quadratic by design), so its per-key bench time is
  * artificially flat across scale factors. This probe exercises the
  * SCALE path end to end on the FULL corpus of the given sf dir:
  * MinHash/LSH candidate pairs (the production pair source) → GraphX
  * connected components → keeper selection, and reports wall time,
  * pair/cluster counts, and the Pregel iteration bound implied by the
  * largest component's diameter proxy (cluster size), so a reader can
  * see whether iteration count stays bounded as the pair graph grows.
  */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.engine.Tables(spark, dir, "documents")
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val pairs = graft.ops.MinHashDedup.candidatePairs(
        docs, "doc_id", "text", numHashes = 16, bands = 4)
      .filter($"est_jaccard" >= 0.5)
      .select($"id_a", $"id_b")
    val comp = graft.ops.DedupCluster.clusters(
      docs.select($"doc_id"), "doc_id", pairs)
    val nRows = comp.count()
    val wallS = (System.nanoTime() - t0) / 1e9

    val nPairs = pairs.count()
    val stats = comp.agg(
      countDistinct($"cluster_id").as("n_clusters"),
      max($"cluster_size").as("max_cluster"),
      sum(when($"is_keeper", 0L).otherwise(1L)).as("n_dropped")).head()
    println(
      s"""{"dir":"$dir","docs":$nDocs,"pairs":$nPairs,"rows":$nRows,""" +
      s""""clusters":${stats.getLong(0)},"max_cluster":${stats.getLong(1)},""" +
      s""""dropped":${stats.getLong(2)},"wall_s":${f"$wallS%.2f"}}""")
    spark.stop()
  }
}
