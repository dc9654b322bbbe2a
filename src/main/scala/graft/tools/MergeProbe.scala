package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch MERGE cost evidence (round-15 verdict item 1): through
  * round 14, `MergeInto.upsertInto` rewrote the ENTIRE table per merge
  * — at a per-micro-batch sink cadence the recurring cost grew with
  * the table, not the batch (the one component whose recurring cost
  * was ∝ corpus). Round 15's merge-on-read lands each batch as an
  * upsert SEGMENT, so per-batch cost must be FLAT as the table grows.
  * This probe publishes the documents table as the base, then lands N
  * fixed-size merge batches, timing each commit individually, plus a
  * reconciled read after every batch (the read-side toll merge-on-read
  * pays until the fold) and the final fold itself. Run with
  * SPARK_GRAFT_MERGE_MODE=cow for the copy-on-write contrast — there
  * the per-batch series GROWS with the table, which is exactly the
  * curve the default mode abolishes.
  *
  * Usage: graft.tools.MergeProbe [sfDir] [batches] — auto-fold is
  * disabled so every batch pays the same shape; the fold is timed
  * separately (it is the amortized LSM cost, scheduled, not per-batch).
  */
object MergeProbe {

  private def stealJiffies(): Long =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 6
    val mode = sys.env.getOrElse("SPARK_GRAFT_MERGE_MODE", "mor")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(graft.ops.MergeInto.ModeKey, mode)
    spark.conf.set(graft.ops.MergeInto.CompactAfterKey, "0") // fold timed separately
    def t[A](f: => A): (Double, Long) = {
      val j0 = stealJiffies(); val s = System.nanoTime(); f
      ((System.nanoTime() - s) / 1e9,
        if (j0 < 0) -1L else stealJiffies() - j0)
    }
    val table = graft.engine.Scratch.dir("merge_probe")
    val hp = new org.apache.hadoop.fs.Path(table)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    // fixed-size batch: ~20k docs at sf100 (the LSM keys' day shape),
    // proportionally smaller on small corpora
    val stride = math.max(2L, n / 20000L)
    val (publishSec, publishSteal) = t(
      graft.ops.AtomicPublish.publish(spark, table)(p => docs.write.parquet(p)))
    val runs = (0 until batches).map { k =>
      // batch k: every stride-th doc updated (same keys recur across
      // batches — real UPDATE pressure, not pure insert)
      val batch = docs.filter(col("doc_id") % stride === k % stride.toInt)
        .withColumn("n_chars", col("n_chars") + lit(k + 1))
      val (mSec, mSteal) = t(
        graft.ops.MergeInto.upsertInto(spark, table, batch, Seq("doc_id")))
      val (rSec, rSteal) = t(
        graft.ops.AtomicPublish.read(spark, table)
          .agg(count(lit(1)), sum(col("n_chars"))).collect())
      (mSec, mSteal, rSec, rSteal)
    }
    val (foldSec, foldSteal) = t(graft.ops.MergeInto.compactMerged(spark, table))
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","mode":"$mode","n":$n,"batches":$batches,""" +
      s""""publish":${j(publishSec)},"publish_steal":$publishSteal,""" +
      s""""merge_sec":[${runs.map(r => j(r._1)).mkString(",")}],""" +
      s""""merge_steal":[${runs.map(_._2).mkString(",")}],""" +
      s""""read_sec":[${runs.map(r => j(r._3)).mkString(",")}],""" +
      s""""read_steal":[${runs.map(_._4).mkString(",")}],""" +
      s""""fold":${j(foldSec)},"fold_steal":$foldSteal}""")
    spark.stop()
  }
}
