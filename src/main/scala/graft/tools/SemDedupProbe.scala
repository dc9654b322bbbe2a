package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timer for the kmeans-blocked SemDeDup path: fit, assignment,
  * pair loop, and the CC labeling — separates the Lloyd/GraphX
  * constants from the n-proportional terms so the decade rows in
  * BASELINE.md can name what grows.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/scratch/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"  $tag%-28s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/embeddings.parquet")
    println(s"n=$n dir=$dir")
    val targetCell = spark.conf.getOption(graft.ops.SemDedup.TargetCellKey)
      .map(_.toInt).getOrElse(graft.ops.SemDedup.TargetCellDefault)
    val k = math.max(4, math.ceil(n.toDouble / targetCell).toInt)
    val model = t(s"fit k=$k (cold)") {
      graft.ops.SemDedup.fit(spark, emb, "vec_id", "e", k, 64, n)
    }
    t("fit (memoized)") {
      graft.ops.SemDedup.fit(spark, emb, "vec_id", "e", k, 64, n,
        cacheKey = Some(s"probe:$dir"))
    }
    val pairs = t("blockedPairs full") {
      graft.ops.SemDedup.blockedPairs(spark, emb, "vec_id", "e", 0.45, 64, n,
        cacheKey = Some(s"probe:$dir")).cache()
    }
    val np = t("pairs count (exec)") { pairs.count() }
    println(s"  pairs=$np")
    t("pairs count (cached)") { pairs.count() }
    val labeled = t("CC labels") {
      graft.ops.DedupCluster.clusters(emb.select($"vec_id"), "vec_id",
        pairs.select($"id_a", $"id_b")).count()
    }
    println(s"  labeled=$labeled")
    // second full end-to-end with warm fit = the bench-repeat shape
    t("end-to-end (warm fit)") {
      val p2 = graft.ops.SemDedup.blockedPairs(spark, emb, "vec_id", "e",
        0.45, 64, n, cacheKey = Some(s"probe:$dir"))
      graft.ops.DedupCluster.clusters(emb.select($"vec_id"), "vec_id",
        p2.select($"id_a", $"id_b")).count()
    }
    spark.stop()
  }
}
