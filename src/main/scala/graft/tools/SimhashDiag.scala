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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_DIAG_PARTS", "32").toInt)
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
    val g = fp.groupBy("fp").agg(count(lit(1)).as("cnt")).cache()
    val Seq(nd, withinPairs, maxCnt) = g
      .agg(count(lit(1)), sum($"cnt" * ($"cnt" - 1) / 2), max($"cnt"))
      .collect()(0).toSeq.map(v => v.toString.toDouble.toLong)
    println(s"docs=${fp.count()} distinct_fp=$nd " +
      s"within_group_pairs=$withinPairs max_group=$maxCnt")
    // mode "stages": time the ADAPTIVE path's stages separately (fp
    // compute, sampled stats, join) to see where the graded wall goes.
    if (args.length > 2 && args(2) == "stages") {
      val raw = graft.engine.Tables(spark, dir, "documents")
        .select($"doc_id",
          graft.engine.GraftFunctions.simhash64(spark, split($"text", " ")).as("fp"))
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"stage $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val n = t("fp_scan_count")(raw.count())
      val k = graft.ops.HammingJoin.provisionBlocks(n, 6, pairsPerDoc = 11.3)
      val (est, hot) = t("sampled_stats")(
        graft.ops.HammingJoin.estimateProducts(raw, "doc_id", "fp", 6, k, n = n))
      println(f"stage estimate: products=$est%.3g hottest=$hot%.3g (k=$k)")
      t("local_join")(
        graft.ops.HammingJoin.pairsWithinLocal(raw, "doc_id", "fp", 6, k).count())
      spark.stop(); return
    }
    // blocks < -1: bucket-skew probe for |blocks| blocks — Σ cnt² per
    // band vs the uniform model, top buckets.
    if (blocks < -1) {
      val st = graft.ops.HammingJoin.bucketStats(fp, "fp", 6, -blocks).cache()
      val tot = st.agg(sum($"cnt" * $"cnt"), count(lit(1))).collect()(0)
      println(s"sum_cnt2=${tot.get(0)} n_buckets=${tot.get(1)}")
      st.groupBy(floor(log2($"cnt")).as("log2cnt"))
        .agg(count(lit(1)).as("buckets"), sum($"cnt" * $"cnt").as("cnt2"),
          sum($"cnt").as("rows"))
        .orderBy($"log2cnt").show(40, false)
    }
    // blocks < 0: distinct-ratio probe only (the collapse-planner input) —
    // skip the join, which at sf100 is exactly the regime under study.
    if (blocks >= 0) {
      val mode = if (args.length > 2) args(2) else "local"
      val t0 = System.nanoTime()
      val pairs =
        if (mode == "rel")
          graft.ops.HammingJoin.pairsWithin(fp, "doc_id", "fp", 6, blocks)
        else
          graft.ops.HammingJoin.pairsWithinLocal(fp, "doc_id", "fp", 6, blocks)
      println(s"pairs_within_6=${pairs.count()} (blocks=$blocks mode=$mode) " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
