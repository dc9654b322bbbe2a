package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-operations-only cost evidence for the IVF index cycle
  * (round-13 verdict item 6): the graded `sim_search_ivf_cycle` key
  * rebuilds its corpus base IN-KEY by design (ensure* refuses to reuse
  * a grown table, so every graded run replays the identical two-day
  * cycle) — which makes the graded sf100 number a build+cycle figure,
  * not the RECURRING cost a daily operator actually pays. This probe
  * separates them: one cold base build, then N day cycles (search →
  * append → search) over the already-published table, timed
  * individually. Prints one JSON line.
  *
  * Usage: graft.tools.IvfDayOpsProbe [sfDir] [days]
  */
object IvfDayOpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val days = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    val table = graft.ops.DedupIndex.defaultTablePath("ivf_dayops", dir)
    val hp = new org.apache.hadoop.fs.Path(table)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val nAll = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/embeddings.parquet")
    // corpus = the bulk; each day appends a batch-sized slice — 20k
    // vectors at sf100 (the graded cycle's day shape), proportionally
    // smaller on small corpora so the corpus never goes empty
    val dayRows = math.max(50L, math.min(20000L, nAll / (5L * days)))
    val corpusLo = dayRows * days
    val corpus = emb.filter(col("vec_id") >= corpusLo)
    val queries = emb.filter(col("vec_id") < 100)
    val build = t(graft.ops.DedupIndex.ensureIvfIndex(spark, table, corpus,
      s"$dir/embeddings.parquet", s"vec_id>=$corpusLo#dayops", "vec_id", "e"))
    val reuse = t(graft.ops.DedupIndex.ensureIvfIndex(spark, table, corpus,
      s"$dir/embeddings.parquet", s"vec_id>=$corpusLo#dayops", "vec_id", "e"))
    def search(): Long = graft.ops.DedupIndex.ivfTopKIndexed(
      spark, table, queries, "vec_id", "e", k = 10).count()
    val cycles = (0 until days).map { d =>
      val day = emb.filter(col("vec_id") >= dayRows * d &&
        col("vec_id") < dayRows * (d + 1))
      t { search(); graft.ops.DedupIndex.appendToIvfIndex(spark, table, day)
          search(); () }
    }
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$nAll,"build_cold":${j(build)},""" +
      s""""reuse_check":${j(reuse)},"day_cycles":[${cycles.map(j).mkString(",")}],""" +
      s""""day_rows":$dayRows}""")
    spark.stop()
  }
}
