package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for INCREMENTAL OPTIMIZE (round 16): on a clustered
  * table that keeps growing, `optimizeTable(onlyNew = true)` must cost
  * ∝ the new data + the affected ranges — never the corpus — while the
  * FULL clustering rewrite (the round-15 baseline) scales with the
  * corpus. The probe publishes the documents table, pays the one full
  * clustering, then lands fixed-size batches (an append of brand-new
  * ids above every range + a narrow low-key merge) and times each
  * incremental fold: across corpus decades the incremental series must
  * stay FLAT (fixed batch ⇒ fixed work) as the full-optimize term
  * grows, and most base directories must survive each fold verbatim.
  *
  * Usage: graft.tools.OptimizeIncProbe [sfDir] [rounds]
  */
object OptimizeIncProbe {

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
    def fresh(name: String): String = {
      val p = graft.engine.Scratch.dir(name)
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) { fs.delete(hp, true); () }
      p
    }
    val table = fresh("optincprobe")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    val stride = math.max(2L, n / 20000L) // ~20k rows per batch at any sf
    // generated corpora carry SPARSE ids (max ≈ 20000×n) — batch id
    // shifts must clear the OBSERVED max, not n, or the "new day"
    // lands inside the existing key space and legitimately dirties
    // every range
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    graft.ops.AtomicPublish.publish(spark, table)(p => docs.write.parquet(p))
    val (fullSec, fullSteal) = t {
      val out = graft.ops.AtomicPublish.optimizeTable(spark, table,
        clusterBy = Seq("doc_id"), segments = 16)
      require(out.isInstanceOf[
        graft.ops.AtomicPublish.CompactOutcome.Compacted], out.toString)
    }
    val folds = (0 until rounds).map { k =>
      // fixed-size batches: new ids ABOVE every existing range (the
      // daily-append shape) + a narrow merge at the bottom range
      val appendBatch = docs.filter(col("doc_id") % stride === k % stride)
        .withColumn("doc_id", col("doc_id") + lit(k + 1L) * lit(maxId + 1))
      val (aSec, aSteal) = t(
        graft.ops.AtomicPublish.appendSegment(spark, table)(p =>
          appendBatch.write.parquet(p)))
      val mergeBatch = docs.filter(col("doc_id") < maxId / 100)
        .filter(col("doc_id") % 7 === k % 7)
        .withColumn("n_chars", col("n_chars") + lit(k + 1))
      val (mSec, mSteal) = t(
        graft.ops.MergeInto.upsertInto(spark, table, mergeBatch,
          Seq("doc_id")))
      val base = graft.ops.AtomicPublish.currentSegments(spark, table)
        .filter(d => graft.ops.AtomicPublish.clusterMeta(spark, table)
          .exists(_._2.contains(d)))
      var kept = 0
      val (iSec, iSteal) = t {
        val out = graft.ops.AtomicPublish.optimizeTable(spark, table,
          clusterBy = Seq("doc_id"), segments = 16, onlyNew = true)
        require(out.isInstanceOf[
          graft.ops.AtomicPublish.CompactOutcome.Compacted], out.toString)
        val after = graft.ops.AtomicPublish.currentSegments(spark, table)
        kept = base.count(after.contains)
      }
      (aSec, aSteal, mSec, mSteal, iSec, iSteal, kept, base.size)
    }
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"rounds":$rounds,""" +
      s""""optimize_full":${j(fullSec)},"optimize_full_steal":$fullSteal,""" +
      s""""folds":[${folds.map(f =>
        s"""{"append_sec":${j(f._1)},"append_steal":${f._2},""" +
          s""""merge_sec":${j(f._3)},"merge_steal":${f._4},""" +
          s""""inc_optimize_sec":${j(f._5)},"inc_optimize_steal":${f._6},""" +
          s""""kept_base_segs":${f._7},"base_segs":${f._8}}""").mkString(",")}]}""")
    spark.stop()
  }
}
