package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch DELETE + change-feed cost evidence (round 15): row-level
  * DELETE lands as a key-only tombstone segment, so per-batch cost
  * must be FLAT as the table grows (the copy-on-write alternative
  * rewrites the corpus per delete), and `changesBetween` must cost
  * ∝ the CHANGES in the window plus ONE key-pruned snapshot scan —
  * never a full-width corpus scan.
  *
  * The probe publishes the documents table, lands alternating
  * delete/re-upsert batches of fixed size (timing each commit and a
  * reconciled read after it), then times one `changesBetween` spanning
  * the whole window and the final fold. Run across sf0.1 → sf100 to
  * read the decade curve: `delete_sec`/`merge_sec` flat, `cdf_sec`
  * dominated by the key-pruned snapshot scan term (grows ∝ corpus
  * keys, the irreducible classification input), fold ∝ corpus (the
  * scheduled LSM cost, not per-batch).
  *
  * Usage: graft.tools.DeleteCdfProbe [sfDir] [rounds]
  */
object DeleteCdfProbe {

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
    spark.conf.set(graft.ops.MergeInto.CompactAfterKey, "0") // fold timed separately
    def t[A](f: => A): (Double, Long) = {
      val j0 = stealJiffies(); val s = System.nanoTime(); f
      ((System.nanoTime() - s) / 1e9,
        if (j0 < 0) -1L else stealJiffies() - j0)
    }
    val table = graft.engine.Scratch.dir("delete_probe")
    val hp = new org.apache.hadoop.fs.Path(table)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    val stride = math.max(2L, n / 20000L) // ~20k keys per batch at sf100
    val (publishSec, publishSteal) = t(
      graft.ops.AtomicPublish.publish(spark, table)(p => docs.write.parquet(p)))
    val v0 = graft.ops.AtomicPublish.currentVersion(spark, table).get
    val runs = (0 until rounds).flatMap { k =>
      val keys = docs.filter(col("doc_id") % stride === k % stride.toInt)
        .select(col("doc_id"))
      val (dSec, dSteal) = t(
        graft.ops.MergeInto.deleteFrom(spark, table, keys, Seq("doc_id")))
      val (r1Sec, r1Steal) = t(
        graft.ops.AtomicPublish.read(spark, table)
          .agg(count(lit(1)), sum(col("n_chars"))).collect())
      // re-upsert the same keys: tombstone-then-reinsert, the ordinal
      // clock's worst case for the claims join
      val batch = docs.filter(col("doc_id") % stride === k % stride.toInt)
        .withColumn("n_chars", col("n_chars") + lit(k + 1))
      val (uSec, uSteal) = t(
        graft.ops.MergeInto.upsertInto(spark, table, batch, Seq("doc_id")))
      val (r2Sec, r2Steal) = t(
        graft.ops.AtomicPublish.read(spark, table)
          .agg(count(lit(1)), sum(col("n_chars"))).collect())
      Seq(("delete", dSec, dSteal, r1Sec, r1Steal),
        ("upsert", uSec, uSteal, r2Sec, r2Steal))
    }
    val vNow = graft.ops.AtomicPublish.currentVersion(spark, table).get
    val (cdfSec, cdfSteal) = t {
      val f = graft.ops.AtomicPublish.changesBetween(spark, table, v0, vNow)
      f.groupBy(col("_change_type")).agg(count(lit(1))).collect()
    }
    val (foldSec, foldSteal) = t(graft.ops.MergeInto.compactMerged(spark, table))
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"rounds":$rounds,""" +
      s""""publish":${j(publishSec)},"publish_steal":$publishSteal,""" +
      s""""ops":[${runs.map(r => s"""{"op":"${r._1}","sec":${j(r._2)},"steal":${r._3},"read_sec":${j(r._4)},"read_steal":${r._5}}""").mkString(",")}],""" +
      s""""cdf_sec":${j(cdfSec)},"cdf_steal":$cdfSteal,""" +
      s""""fold":${j(foldSec)},"fold_steal":$foldSteal}""")
    spark.stop()
  }
}
