package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-ops evidence for the PUBLISHED PQ index (round 16): the corpus
  * pays the encode pass ONCE (`ensurePqIndex` — fit + encode every
  * vector); a day's growth then appends by encoding ONLY the batch
  * under the published codebooks (`appendToPqIndex`). Across corpus
  * decades the ensure term must grow with the corpus while the append
  * term stays flat (fixed batch) — append ≪ re-encode is the whole
  * reason the index is published rather than re-derived per session.
  *
  * Usage: graft.tools.PqDayOpsProbe [sfDir] [rounds]
  */
object PqDayOpsProbe {

  private def stealJiffies(): Long =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (Double, Long) = {
      val j0 = stealJiffies(); val s = System.nanoTime(); f
      ((System.nanoTime() - s) / 1e9,
        if (j0 < 0) -1L else stealJiffies() - j0)
    }
    val table = {
      val p = graft.engine.Scratch.dir("pqdayops")
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) { fs.delete(hp, true); () }
      p
    }
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/embeddings.parquet")
    val stride = math.max(2L, n / 10000L) // ~10k vectors per day batch
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val (ensureSec, ensureSteal) = t(
      graft.ops.DedupIndex.ensurePqIndex(spark, table, emb,
        s"$dir/embeddings.parquet", "all#dayops", "vec_id", "e"))
    val appends = (0 until rounds).map { k =>
      val batch = emb.filter(col("vec_id") % stride === k % stride)
        .withColumn("vec_id", col("vec_id") + lit(k + 1L) * lit(maxId + 1))
      var nShort = 0L
      val (aSec, aSteal) = t(
        graft.ops.DedupIndex.appendToPqIndex(spark, table, batch))
      // a post-append search spans corpus ∪ appended days
      val (sSec, sSteal) = t {
        nShort = graft.ops.DedupIndex.pqShortlistIndexed(spark, table,
          emb.filter(col("vec_id") < 3), "vec_id", "e", shortlist = 50)
          .count()
      }
      (aSec, aSteal, sSec, sSteal, nShort)
    }
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"rounds":$rounds,""" +
      s""""pq_ensure":${j(ensureSec)},"pq_ensure_steal":$ensureSteal,""" +
      s""""appends":[${appends.map(a =>
        s"""{"append_sec":${j(a._1)},"append_steal":${a._2},""" +
          s""""search_sec":${j(a._3)},"search_steal":${a._4},""" +
          s""""shortlist_rows":${a._5}}""").mkString(",")}]}""")
    spark.stop()
  }
}
