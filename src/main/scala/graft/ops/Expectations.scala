package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-gate EXPECTATIONS for training-data admission — the
  * lakehouse constraint/expectation surface (the Delta CHECK-constraint
  * / DLT-expectation shape) over [[AtomicPublish]] tables. A corpus
  * table at 100 TB is fed by many upstream jobs; the table, not each
  * job, should own the admission rules ("docs must be ≥100 chars",
  * "language must be tagged") so a misconfigured producer cannot poison
  * the corpus silently.
  *
  * An expectation is a NAMED boolean SQL predicate evaluated per row. A
  * row VIOLATES the rule iff the predicate is not TRUE — false and NULL
  * both violate (a doc with NULL text fails `min_chars`; SQL CHECK's
  * null-passes convention would admit exactly the malformed rows a
  * quality gate exists to stop). Enforcement modes:
  *
  *  - [[stamp]]: annotate every row with `_violations` (comma-joined
  *    names of the rules it fails, '' when clean) — triage/reporting.
  *  - [[split]]: (clean, violating-with-`_violations`) — the router.
  *  - [[appendChecked]]: the TABLE-INTEGRATED gate. Rules persist at
  *    the table root ([[set]], one tab-separated line per rule, written
  *    under the commit lock); every checked append then splits the
  *    batch — clean rows append to the table, violating rows (stamped
  *    `_violations`) append to the sibling `<table>_quarantine` table —
  *    or fails loudly with per-rule counts (`mode=fail`), or drops
  *    (`mode=drop`). Nothing half-lands: the quarantine commit happens
  *    BEFORE the main-table commit, so a crash between them leaves only
  *    quarantined rows (re-running the batch re-quarantines
  *    harmlessly), never unvetted rows in the corpus. The quarantine
  *    table auto-publishes on FIRST use; two producers racing that
  *    very first batch are last-writer-wins on the base segment (every
  *    later batch appends, which is race-safe) — a multi-producer
  *    deployment should seed the quarantine with one gated append
  *    before fanning out.
  *
  * Scale shape: stamping is a pure codegen projection (a `when` chain —
  * no shuffle, no UDF); the split costs two filtered passes over THE
  * BATCH (each side's filter pushed to the batch's scan), never the
  * table. Rule evaluation cost is ∝ batch × rules, the same envelope as
  * the write itself.
  */
object Expectations {

  /** A named admission rule: `predicate` is a boolean SQL expression
    * over the table's columns (e.g. `n_chars >= 100`). Names must be
    * unique per rule set; they become the `_violations` vocabulary. */
  final case class Expectation(name: String, predicate: String) {
    require(name.nonEmpty && !name.contains(",") && !name.contains("\t") &&
      !name.contains("\n"),
      s"expectation name must be nonempty without `,`/tab/newline: `$name`")
    require(!predicate.contains("\t") && !predicate.contains("\n"),
      s"expectation predicate must be single-line without tabs: `$predicate`")
  }

  /** The stamped column: comma-joined names of violated rules, in rule
    * declaration order; empty string for a clean row. */
  val ViolationsCol = "_violations"

  /** Rules sidecar at the table root (tab-separated `name\tpredicate`
    * lines). `_`-prefixed: invisible to parquet readers. */
  val ExpectFile = "_graft_expectations"

  private def violates(e: Expectation): Column =
    !coalesce(expr(e.predicate).cast("boolean"), lit(false))

  /** Annotate every row with [[ViolationsCol]]. Pure projection —
    * `concat_ws` skips the NULLs of passing rules, so the chain stays
    * inside whole-stage codegen with zero extra passes. */
  def stamp(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    requireRules(rules)
    df.withColumn(ViolationsCol,
      concat_ws(",", rules.map(e =>
        when(violates(e), lit(e.name))): _*))
  }

  /** Split into (clean, violating). The violating side carries
    * [[ViolationsCol]]; the clean side keeps the input schema. */
  def split(df: DataFrame, rules: Seq[Expectation])
      : (DataFrame, DataFrame) = {
    requireRules(rules)
    val anyViolation = rules.map(violates).reduce(_ || _)
    (df.filter(!anyViolation), stamp(df, rules).filter(col(ViolationsCol) =!= ""))
  }

  /** Per-rule violation counts — ONE aggregation pass (conditional
    * counts, map-side combined), not a pass per rule. */
  def violationCounts(df: DataFrame, rules: Seq[Expectation])
      : Map[String, Long] = {
    requireRules(rules)
    val row = df.agg(
      count(lit(1)).as("_n"),
      rules.map(e => count(when(violates(e), 1)).as(e.name)): _*).head()
    rules.map(e => e.name -> row.getAs[Long](e.name)).toMap
  }

  private def requireRules(rules: Seq[Expectation]): Unit = {
    require(rules.nonEmpty, "expectations: empty rule set")
    val dup = rules.groupBy(_.name).collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty, s"duplicate expectation names: ${dup.mkString(",")}")
  }

  // ---------------------------------------------------------------
  // Table-persisted rules
  // ---------------------------------------------------------------

  /** Persist `rules` as the table's admission contract (replacing any
    * prior set). Written under the table's commit lock so a concurrent
    * [[appendChecked]] reads either the old or the new complete set,
    * never a torn file. */
  def set(spark: SparkSession, tablePath: String,
          rules: Seq[Expectation]): Unit = {
    requireRules(rules)
    AtomicPublish.withTableLock(spark, tablePath) { (fs, root) =>
      val out = fs.create(new org.apache.hadoop.fs.Path(root, ExpectFile), true)
      try out.write(rules.map(e => s"${e.name}\t${e.predicate}")
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** The table's persisted rule set (empty when none was ever set). */
  def get(spark: SparkSession, tablePath: String): Seq[Expectation] = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root, ExpectFile)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try {
          val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          in.readFully(bytes)
          new String(bytes, "UTF-8")
        } finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { line =>
        line.split("\t", 2) match {
          case Array(n, pred) => Expectation(n, pred)
          case _ => throw new IllegalStateException(
            s"torn expectations sidecar at $tablePath: `$line`")
        }
      }.toSeq
    }
  }

  /** Outcome of a checked append: rows admitted to the table vs rows
    * quarantined (mode=quarantine) or dropped (mode=drop). */
  final case class AdmitStats(admitted: Long, rejected: Long)

  /** Sibling quarantine table of a gated table. */
  def quarantinePath(tablePath: String): String =
    tablePath.stripSuffix("/") + "_quarantine"

  /** Append `batch` through the table's persisted expectations
    * ([[set]]). Modes:
    *  - `"fail"`: any violation aborts the whole batch LOUDLY with
    *    per-rule counts; nothing lands.
    *  - `"drop"`: clean rows append; violating rows vanish (counted).
    *  - `"quarantine"`: clean rows append; violating rows (stamped
    *    [[ViolationsCol]]) append to `<table>_quarantine`, auto-
    *    published on first use — the triage queue a data curator
    *    replays after fixing the producer.
    *
    * The batch is evaluated ONCE per side (two pushed-filter passes);
    * counts come from the committed segments' own row counts, not a
    * third pass. */
  def appendChecked(spark: SparkSession, tablePath: String,
                    batch: DataFrame, mode: String = "quarantine")
      : AdmitStats = {
    val rules = get(spark, tablePath)
    require(rules.nonEmpty,
      s"appendChecked: no expectations set at $tablePath — call " +
        "Expectations.set first (or use AtomicPublish.appendSegment for " +
        "an ungated append)")
    val (clean, bad) = split(batch, rules)
    mode match {
      case "fail" =>
        val counts = violationCounts(batch, rules).filter(_._2 > 0)
        if (counts.nonEmpty) throw new IllegalStateException(
          s"appendChecked(fail) at $tablePath: batch violates " +
            counts.toSeq.sortBy(_._1)
              .map { case (n, c) => s"$n×$c" }.mkString(", ") +
            " — nothing was appended")
        val d = AtomicPublish.appendSegment(spark, tablePath)(p =>
          batch.write.parquet(p))
        AdmitStats(segmentRows(spark, tablePath, d), 0L)
      case "drop" | "quarantine" =>
        var rejected = 0L
        if (mode == "quarantine" && !bad.isEmpty) {
          // clean batches skip the quarantine commit entirely —
          // otherwise every clean append would grow the quarantine
          // manifest (and pay its lock) ∝ clean traffic
          val qt = quarantinePath(tablePath)
          val qRoot = new org.apache.hadoop.fs.Path(qt)
          val qFs = qRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // quarantine FIRST: a crash between the two commits must
          // never leave unvetted rows admitted without their rejects
          // recorded; the reverse order could
          val qSeg =
            if (!qFs.exists(new org.apache.hadoop.fs.Path(qRoot,
              "MANIFEST")))
              AtomicPublish.publish(spark, qt)(p => bad.write.parquet(p))
            else AtomicPublish.appendSegment(spark, qt)(p =>
              bad.write.parquet(p))
          rejected = segmentRows(spark, qt, qSeg)
        } else if (mode == "drop") {
          rejected = bad.count()
        }
        val d = AtomicPublish.appendSegment(spark, tablePath)(p =>
          clean.write.parquet(p))
        AdmitStats(segmentRows(spark, tablePath, d), rejected)
      case other => throw new IllegalArgumentException(
        s"appendChecked mode must be fail|drop|quarantine, got `$other`")
    }
  }

  /** Gated MERGE — the upsert twin of [[appendChecked]], closing the
    * obvious bypass (a producer MERGEing instead of appending would
    * otherwise skip the table's admission contract entirely): clean
    * rows MERGE into the table ([[MergeInto.upsertInto]], merge-on-read
    * by default), violating rows quarantine / drop / fail exactly as
    * in [[appendChecked]], with the quarantine commit landing FIRST.
    * A quarantined row is NOT merged — its key's previous value stays
    * live in the corpus until a corrected batch re-merges it. */
  def upsertChecked(spark: SparkSession, tablePath: String,
                    batch: DataFrame, keys: Seq[String],
                    mode: String = "quarantine"): AdmitStats = {
    val rules = get(spark, tablePath)
    require(rules.nonEmpty,
      s"upsertChecked: no expectations set at $tablePath — call " +
        "Expectations.set first (or use MergeInto.upsertInto for an " +
        "ungated merge)")
    val (clean, bad) = split(batch, rules)
    mode match {
      case "fail" =>
        val counts = violationCounts(batch, rules).filter(_._2 > 0)
        if (counts.nonEmpty) throw new IllegalStateException(
          s"upsertChecked(fail) at $tablePath: batch violates " +
            counts.toSeq.sortBy(_._1)
              .map { case (n, c) => s"$n×$c" }.mkString(", ") +
            " — nothing was merged")
        val n = batch.count()
        MergeInto.upsertInto(spark, tablePath, batch, keys)
        AdmitStats(n, 0L)
      case "drop" | "quarantine" =>
        var rejected = 0L
        if (mode == "quarantine" && !bad.isEmpty) {
          // clean batches skip the quarantine commit (see appendChecked)
          val qt = quarantinePath(tablePath)
          val qRoot = new org.apache.hadoop.fs.Path(qt)
          val qFs = qRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val qSeg =
            if (!qFs.exists(new org.apache.hadoop.fs.Path(qRoot, "MANIFEST")))
              AtomicPublish.publish(spark, qt)(p => bad.write.parquet(p))
            else AtomicPublish.appendSegment(spark, qt)(p =>
              bad.write.parquet(p))
          rejected = segmentRows(spark, qt, qSeg)
        } else if (mode == "drop") rejected = bad.count()
        val admitted = clean.count()
        if (admitted > 0) { MergeInto.upsertInto(spark, tablePath, clean, keys); () }
        AdmitStats(admitted, rejected)
      case other => throw new IllegalArgumentException(
        s"upsertChecked mode must be fail|drop|quarantine, got `$other`")
    }
  }

  /** Row count of a just-committed segment, straight from the parquet
    * footers on the driver — the previous `read.parquet(...).count()`
    * was metadata-only in bytes but still paid a schema-resolution job
    * plus a count job per checked commit. An EMPTY or nested listing
    * falls back to the loud Spark count (round 17, ADVICE r16: a
    * silent 0 from an unexpectedly-shaped segment would let a
    * malformed quarantine commit satisfy rows==0 expectations; every
    * graft-written segment has top-level part files, so the fallback
    * never fires on the protocol's own writes). */
  private def segmentRows(spark: SparkSession, tablePath: String,
                          dataDir: String): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val sp = new org.apache.hadoop.fs.Path(s"$tablePath/$dataDir")
    val fs = sp.getFileSystem(conf)
    val parts = fs.listStatus(sp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty)
      return spark.read.parquet(s"$tablePath/$dataDir").count()
    parts.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(f.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }.sum
  }
}
