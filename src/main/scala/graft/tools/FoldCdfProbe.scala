package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-16 headline fix: the change feed (and
  * everything built on it) SURVIVES COMPACTION. The probe publishes the
  * documents table, creates a per-(lang, source) MV, then lets the view
  * LAG across a [merge, FOLD, merge, FOLD, merge] window — exactly the
  * auto-fold cadence that round-15 `changesBetween` refused, forcing a
  * full-corpus `fullRefresh`. Measured per decade:
  *
  *  - `feed_sec`: `changesBetween` across the whole fold-spanning
  *    window (count of typed changes) — must stay ∝ the changes + one
  *    key-pruned snapshot scan per fold-free run, never the corpus
  *    width;
  *  - `refresh_sec`: ONE `MaterializedView.refresh` across the window
  *    (the lagging-consumer case) — must stay FLAT across corpus
  *    decades at fixed batch size: its terms are the feed, the
  *    key-pruned preimage scans, the affected-group recompute, and two
  *    MV commits — ∝ changes plus a fixed multi-job constant;
  *  - `full_sec`: `fullRefresh` of the same view — ∝ THE CORPUS by
  *    construction (one full group-by + republish). Honest reading at
  *    LOCAL scales: a 600 MB "sf100" corpus aggregates in ~1 s, so the
  *    corpus term hides under job constants and full beats refresh in
  *    absolute seconds here; the decade evidence is refresh's FLATNESS
  *    (the corpus grew ×100, refresh didn't), which is what survives
  *    the extrapolation to real table sizes where the full scan term
  *    is hours, not seconds.
  *
  * Usage: graft.tools.FoldCdfProbe [sfDir]
  */
object FoldCdfProbe {

  private def stealJiffies(): Long =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val table = fresh("foldcdf_src")
    val mv = fresh("foldcdf_view")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    val stride = math.max(2L, n / 20000L) // ~20k keys per merge batch
    graft.ops.AtomicPublish.publish(spark, table)(p => docs.write.parquet(p))
    graft.ops.MaterializedView.create(spark, mv, table,
      keys = Seq("doc_id"), groupCols = Seq("lang", "source"),
      aggs = Seq(
        graft.ops.MaterializedView.AggSpec("n_docs", "COUNT(*)"),
        graft.ops.MaterializedView.AggSpec("sum_chars",
          "CAST(SUM(n_chars) AS BIGINT)")))
    val v0 = graft.ops.AtomicPublish.currentVersion(spark, table).get
    // the lag window: merge, FOLD, merge, FOLD, merge — the view and
    // any CDC consumer sleep through all of it
    var folds = 0
    (0 until 3).foreach { k =>
      val batch = docs.filter(col("lang") === "de" &&
          col("doc_id") % stride === k % stride)
        .withColumn("n_chars", col("n_chars") + lit(k + 1))
      graft.ops.MergeInto.upsertInto(spark, table, batch, Seq("doc_id"))
      if (k < 2) {
        val out = graft.ops.MergeInto.compactMerged(spark, table)
        require(out.isInstanceOf[
          graft.ops.AtomicPublish.CompactOutcome.Compacted], out.toString)
        folds += 1
      }
    }
    val vNow = graft.ops.AtomicPublish.currentVersion(spark, table).get
    var nChanges = 0L
    val (feedSec, feedSteal) = t {
      nChanges = graft.ops.AtomicPublish
        .changesBetween(spark, table, v0, vNow).count()
    }
    var stats: graft.ops.MaterializedView.RefreshStats = null
    val (refreshSec, refreshSteal) = t {
      stats = graft.ops.MaterializedView.refresh(spark, mv)
    }
    require(stats.toVersion == vNow && stats.affectedGroups > 0,
      s"refresh must cross the fold window: $stats")
    val (fullSec, fullSteal) = t(
      graft.ops.MaterializedView.fullRefresh(spark, mv))
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"folds":$folds,""" +
      s""""window_commits":${vNow - v0},"n_changes":$nChanges,""" +
      s""""feed_sec":${j(feedSec)},"feed_steal":$feedSteal,""" +
      s""""refresh_sec":${j(refreshSec)},"refresh_steal":$refreshSteal,""" +
      s""""affected_groups":${stats.affectedGroups},""" +
      s""""full_sec":${j(fullSec)},"full_steal":$fullSteal}""")
    spark.stop()
  }
}
