package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.AnnSearch

/** Parameter sweep for the hyperplane-LSH ANN: recall@10 vs brute force
  * and candidate fraction per (tables, bits, multiProbe). Run at
  * sf0.01/sf0.1 when retuning for a new corpus.
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e")).cache()
    val n = emb.count()
    val nq = emb.filter($"vec_id" < 5).count()
    val exact = AnnSearch.bruteTopK(spark, emb, "vec_id", "e", col("id") < 5)
      .select($"q_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (tables, bits) <- Seq((4, 4), (4, 6), (6, 5), (8, 4), (4, 8))
      mp <- Seq(false, true)
    } {
      val approx = AnnSearch.lshTopK(spark, emb, "vec_id", "e",
          col("id") < 5, k = 10, tables = tables, bits = bits, multiProbe = mp)
        .select($"q_id", $"neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.intersect(approx).size.toDouble / exact.size
      val cand = AnnSearch.lshCandidates(emb, "vec_id", "e",
        col("id") < 5, tables, bits, mp).count()
      val frac = cand.toDouble / (n * nq)
      println(f"tables=$tables%d bits=$bits%d multiProbe=$mp%-5s recall=$recall%.3f candFrac=$frac%.3f")
    }
    spark.stop()
  }
}
