package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-cost evidence for the persisted dedup indexes
  * (ops/DedupIndex): the graded `*_indexed` keys time the DAILY path
  * (the index is reused across iterations by design), so the one-time
  * build cost must be measured separately for the amortization claim
  * to be honest. This probe deletes any published index for the given
  * corpus dir, times a cold `ensure*` for both kinds, then times the
  * warm reuse check (manifest + stamp read only). Prints one JSON line.
  *
  * Usage: graft.tools.IndexBuildProbe [sfDir]
  */
object IndexBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    def rmrf(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) { fs.delete(hp, true); () }
    }
    val docs = graft.engine.Tables(spark, dir, "documents")
    val corpusD = docs.filter(col("doc_id") >= 100)
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val corpusE = emb.filter(col("vec_id") >= 100)
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/embeddings.parquet")
    val mhTable = graft.ops.DedupIndex.defaultTablePath("minhash", dir)
    val semTable = graft.ops.DedupIndex.defaultTablePath("semantic", dir)
    rmrf(mhTable); rmrf(semTable)
    def buildMh() = graft.ops.DedupIndex.ensureMinHashIndex(spark, mhTable,
      corpusD, s"$dir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    def buildSem() = graft.ops.DedupIndex.ensureSemanticIndex(spark, semTable,
      corpusE, s"$dir/embeddings.parquet", "vec_id>=100", "vec_id", "e",
      dim = 64, corpusSize = math.max(1L, n - 100L))
    val mhCold = t(buildMh())
    val mhWarm = t(buildMh())
    val semCold = t(buildSem())
    val semWarm = t(buildSem())
    // IVF: build cold, reuse check, then APPEND a ~1% "day" of vectors
    // under the existing centroids — the round-13 append-vs-rebuild
    // amortization evidence (a grown corpus previously forced a full
    // ensureIvfIndex republish per day).
    val ivfTable = graft.ops.DedupIndex.defaultTablePath("ivf_probe", dir)
    rmrf(ivfTable)
    def buildIvf() = graft.ops.DedupIndex.ensureIvfIndex(spark, ivfTable,
      corpusE, s"$dir/embeddings.parquet", "vec_id>=100#probe", "vec_id", "e")
    val ivfCold = t(buildIvf())
    val ivfWarm = t(buildIvf())
    val dayCap = math.max(100L, n / 100L)
    val ivfAppend = t(graft.ops.DedupIndex.appendToIvfIndex(spark, ivfTable,
      emb.filter(col("vec_id") < dayCap)))
    def j(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","minhash_build_cold":${j(mhCold)},""" +
      s""""minhash_reuse_check":${j(mhWarm)},"semantic_build_cold":${j(semCold)},""" +
      s""""semantic_reuse_check":${j(semWarm)},"ivf_build_cold":${j(ivfCold)},""" +
      s""""ivf_reuse_check":${j(ivfWarm)},"ivf_append_day":${j(ivfAppend)},""" +
      s""""ivf_day_rows":$dayCap}""")
    spark.stop()
  }
}
