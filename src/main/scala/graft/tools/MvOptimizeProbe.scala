package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-15 second wave (run across
  * sf0.1 → ×1000 to read the decade curves):
  *
  *  - MATERIALIZED-VIEW refresh must cost ∝ the CHANGE BATCH +
  *    affected groups, never the corpus: the probe publishes the
  *    documents table, creates a per-(lang, source) count/sum view,
  *    then lands fixed-size merge batches (~20k keys touching a
  *    handful of groups) and times each `refresh` — the series must
  *    stay FLAT as sf grows while `create` (the one full compute)
  *    scales with the corpus.
  *  - OPTIMIZE clustering is pay-once-to-prune-forever: the probe
  *    times `optimizeTable` (corpus shuffle, the paid term), then a
  *    selective range aggregate BEFORE vs AFTER — the after-series
  *    must beat the before-series by the pruning ratio, increasingly
  *    so at scale (before reads every segment, after reads the
  *    admitting ones).
  *  - RESTORE and idempotent-replay are METADATA commits: timed to
  *    show they stay constant across corpus decades.
  *
  * Usage: graft.tools.MvOptimizeProbe [sfDir] [rounds]
  */
object MvOptimizeProbe {

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
    val table = fresh("mvprobe_src")
    val mv = fresh("mvprobe_view")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark, s"$dir/documents.parquet")
    val stride = math.max(2L, n / 20000L) // ~20k keys per change batch
    val (publishSec, publishSteal) = t(
      graft.ops.AtomicPublish.publish(spark, table)(p => docs.write.parquet(p)))
    val (createSec, createSteal) = t(
      graft.ops.MaterializedView.create(spark, mv, table,
        keys = Seq("doc_id"), groupCols = Seq("lang", "source"),
        aggs = Seq(
          graft.ops.MaterializedView.AggSpec("n_docs", "COUNT(*)"),
          graft.ops.MaterializedView.AggSpec("sum_chars",
            "CAST(SUM(n_chars) AS BIGINT)"))))
    val refreshes = (0 until rounds).map { k =>
      // change batches touch ONE language's docs — the partial-recompute
      // case: affected groups must be the de×source slice, not all 100
      val batch = docs.filter(col("lang") === "de" &&
          col("doc_id") % stride === k % stride.toInt)
        .withColumn("n_chars", col("n_chars") + lit(k + 1))
      val (mSec, mSteal) = t(
        graft.ops.MergeInto.upsertInto(spark, table, batch, Seq("doc_id")))
      var stats: graft.ops.MaterializedView.RefreshStats = null
      val (rSec, rSteal) = t {
        stats = graft.ops.MaterializedView.refresh(spark, mv)
      }
      (mSec, mSteal, rSec, rSteal, stats.affectedGroups, stats.recomputedRows)
    }
    // ---- optimize: selective range aggregate before vs after
    def rangeAgg(): Unit = {
      val lo = n / 2; val hi = n / 2 + n / 64 // ~1.6% of the id space
      // through the graft DSv2 source: manifest zonemap pruning is the
      // machinery optimize exists to feed (the ops-API read lists every
      // segment and leans on row-group stats alone)
      spark.read.format("graft").load(table)
        .filter(col("doc_id") >= lo && col("doc_id") < hi)
        .agg(count(lit(1)), sum(col("n_chars"))).collect()
      ()
    }
    graft.ops.MergeInto.compactMerged(spark, table) // fold MV-probe residue
    val (scanBeforeSec, scanBeforeSteal) = t(rangeAgg())
    val (optSec, optSteal) = t {
      val out = graft.ops.AtomicPublish.optimizeTable(spark, table,
        clusterBy = Seq("doc_id"), segments = 16)
      require(out.isInstanceOf[
        graft.ops.AtomicPublish.CompactOutcome.Compacted], out.toString)
    }
    val (scanAfterSec, scanAfterSteal) = t(rangeAgg())
    // ---- restore + idempotent replay: metadata-only, flat by decade
    val vPre = graft.ops.AtomicPublish.currentVersion(spark, table).get
    graft.ops.AtomicPublish.appendSegmentTxn(spark, table, "probe", 1L)(p =>
      docs.limit(100).write.parquet(p))
    val (replaySec, replaySteal) = t {
      val r = graft.ops.AtomicPublish.appendSegmentTxn(
        spark, table, "probe", 1L)(p => docs.limit(100).write.parquet(p))
      require(r.isEmpty, "replay must be skipped")
    }
    val (restoreSec, restoreSteal) = t(
      graft.ops.AtomicPublish.restoreTable(spark, table, vPre))
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"rounds":$rounds,""" +
      s""""publish":${j(publishSec)},"publish_steal":$publishSteal,""" +
      s""""mv_create":${j(createSec)},"mv_create_steal":$createSteal,""" +
      s""""refreshes":[${refreshes.map(r =>
        s"""{"merge_sec":${j(r._1)},"merge_steal":${r._2},"refresh_sec":${j(r._3)},"refresh_steal":${r._4},"affected_groups":${r._5},"recomputed_rows":${r._6}}""").mkString(",")}],""" +
      s""""scan_before":${j(scanBeforeSec)},"scan_before_steal":$scanBeforeSteal,""" +
      s""""optimize":${j(optSec)},"optimize_steal":$optSteal,""" +
      s""""scan_after":${j(scanAfterSec)},"scan_after_steal":$scanAfterSteal,""" +
      s""""txn_replay":${j(replaySec)},"txn_replay_steal":$replaySteal,""" +
      s""""restore":${j(restoreSec)},"restore_steal":$restoreSteal}""")
    spark.stop()
  }
}
