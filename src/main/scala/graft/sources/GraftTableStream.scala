package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.internal.connector.{SupportsMetadata, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.AtomicPublish

/** STREAMING BY NAME — `spark.readStream.table("cat.db.t")`, the Delta
  * ergonomics for tailing a lakehouse table. The V1 `graft-stream`
  * source ([[GraftStreamSource]]) already tails PATH-addressed tables,
  * but Spark never consults a V1 provider for a catalog-resolved name;
  * a name resolves to the catalog's [[GraftManagedTable]], and
  * streaming flows through its ScanBuilder →
  * `Scan.toMicroBatchStream`. Because the managed table is a plain
  * composed `Table` (NOT a FileTable — exactly the choice that made
  * INSERT routable), the V2 micro-batch door is actually consulted,
  * and these classes open it:
  *
  *   - [[GraftManagedScanBuilder]]/[[GraftManagedScan]] wrap the
  *     parquet DSv2 builder/scan by delegation — every pushdown
  *     interface the parquet builder implements (columns, catalyst
  *     filters, aggregates, variant extractions) and every scan
  *     surface (batch, statistics, metadata, columnar mode) passes
  *     through untouched, so BATCH plans through the catalog are
  *     byte-identical to before (PlanSpec pins pruning and
  *     broadcast-from-statistics) — plus `toMicroBatchStream`.
  *   - [[GraftTableMicroBatchStream]] is the offset machinery of the
  *     V1 tail, restated in V2: the offset is the manifest's
  *     SEGMENT-PREFIX LENGTH, each micro-batch reads exactly the newly
  *     committed segment directories (a day's commit costs a manifest
  *     read plus that day's segments, never the corpus), the
  *     append-only contract is verified on every poll (a compaction or
  *     republish under the stream fails LOUDLY, naming `graft-cdf` as
  *     the fold-surviving alternative), and merge-on-read segments
  *     refuse rather than serve updates as appends.
  *
  * Micro-batch planning reuses the SAME parquet reading machinery as
  * batch: each batch constructs a [[GraftReadOnlyTable]] over only the
  * new segment paths (schema pinned to the table's, columns pruned to
  * this stream's read schema) and delegates partition planning + reader
  * creation to its scan — zero bespoke parquet code, whole-stage
  * codegen and vectorization intact. Each partition carries its
  * batch's own reader factory ([[GraftStreamInputPartition]]), so
  * partitions and readers can never disagree about schema.
  *
  * Admission control: `maxSegmentsPerBatch` caps each micro-batch
  * (backlog pacing — Delta's maxFilesPerTrigger shape);
  * `startingOffset` = `latest` arms the tail at the current manifest
  * length. Both arrive as read options:
  * `spark.readStream.option(…).table("cat.db.t")`.
  */
private[sources] class GraftManagedScanBuilder(
    inner: ScanBuilder,
    spark: SparkSession,
    tableRoot: String,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case s: SupportsPushDownRequiredColumns => s.pruneColumns(requiredSchema)
    case _ => ()
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner match {
      case s: SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters(): Array[Predicate] = inner match {
    case s: SupportsPushDownCatalystFilters => s.pushedFilters
    case _ => Array.empty
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    inner match {
      case s: SupportsPushDownAggregates => s.supportCompletePushDown(agg)
      case _ => false
    }

  override def pushAggregation(agg: Aggregation): Boolean = inner match {
    case s: SupportsPushDownAggregates => s.pushAggregation(agg)
    case _ => false
  }

  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] = inner match {
    case s: SupportsPushDownVariantExtractions =>
      s.pushVariantExtractions(extractions)
    case _ => new Array[Boolean](extractions.length)
  }

  override def build(): Scan =
    new GraftManagedScan(inner.build(), spark, tableRoot, tableSchema, options)
}

private[sources] class GraftManagedScan(
    inner: Scan,
    spark: SparkSession,
    tableRoot: String,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends Scan with SupportsReportStatistics with SupportsMetadata {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def getMetaData(): Map[String, String] = inner match {
    case s: SupportsMetadata => s.getMetaData()
    case _ => Map.empty
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftTableMicroBatchStream(spark, tableRoot, tableSchema,
      readSchema(), options)
}

/** Offset = manifest segment-prefix length, serialized as the bare
  * number (restart-stable; matches the V1 tail's LongOffset JSON). */
private[sources] case class GraftTableOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

private[sources] class GraftTableMicroBatchStream(
    spark: SparkSession,
    tableRoot: String,
    tableSchema: StructType,
    streamReadSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl {

  // Delta spells CDF streaming `option("readChangeFeed", "true")` on
  // the same reader — this tail is APPENDS ONLY, and the change feed's
  // batches are join plans a V2 file stream cannot serve; redirect
  // loudly rather than silently ignoring the option.
  if (Option(options.get("readChangeFeed")).exists(_.trim.toBoolean))
    throw new UnsupportedOperationException(
      s"readStream.table at $tableRoot: readChangeFeed is served by the " +
        "dedicated CDF source — use " +
        "spark.readStream.format(\"graft-cdf\").option(\"path\", …) " +
        "(its offsets are commit versions and it diffs through folds)")

  private val maxPer: Option[Int] =
    Option(options.get("maxSegmentsPerBatch")).map { raw =>
      val n = raw.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"readStream.table at $tableRoot: maxSegmentsPerBatch must be " +
            s"a positive int, got `$raw`"))
      require(n >= 1,
        s"readStream.table at $tableRoot: maxSegmentsPerBatch must be " +
          s">= 1, got $n")
      n
    }

  // starting position — full V1-tail parity: `startingOffset`
  // earliest/latest, `startingVersion` (commit floor via the version
  // log, loud if the log no longer holds v−1), `startingTimestamp`
  // (wall-clock floor — smallest commit at-or-after the instant;
  // past-the-end arms future-only). Mutually exclusive, like Delta.
  private val startFloor: Long = {
    def opt(k: String) = Option(options.get(k))
    def exclusive(a: String, b: String): Unit =
      require(opt(a).isEmpty || opt(b).isEmpty,
        s"readStream.table at $tableRoot: $a and $b are mutually exclusive")
    exclusive("startingVersion", "startingOffset")
    exclusive("startingVersion", "startingTimestamp")
    exclusive("startingTimestamp", "startingOffset")
    opt("startingVersion").map { raw =>
      val v = raw.trim.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"readStream.table at $tableRoot: startingVersion must be a " +
            s"commit version, got `$raw`"))
      require(v >= 1,
        s"readStream.table at $tableRoot: startingVersion must be >= 1, " +
          s"got $v")
      if (v == 1L) 0L
      else AtomicPublish.segmentsAt(spark, tableRoot, v - 1).size.toLong
    }.orElse(opt("startingTimestamp").map { raw =>
      val ts = AtomicPublish.parseInstantMs(raw,
        s"readStream.table at $tableRoot: startingTimestamp")
      val v = AtomicPublish.versionSince(spark, tableRoot, ts)
      val latest = AtomicPublish.currentVersion(spark, tableRoot)
        .getOrElse(0L)
      if (v == 1L) 0L
      else if (v > latest)
        AtomicPublish.currentSegments(spark, tableRoot).size.toLong
      else AtomicPublish.segmentsAt(spark, tableRoot, v - 1).size.toLong
    }).getOrElse(opt("startingOffset").getOrElse("earliest") match {
      case "earliest" => 0L
      case "latest" =>
        AtomicPublish.currentSegments(spark, tableRoot).size.toLong
      case other => throw new IllegalArgumentException(
        s"readStream.table at $tableRoot: startingOffset must be " +
          s"`earliest` or `latest`, got `$other`")
    })
  }

  // the longest segment list this instance has observed — the
  // append-only witness (restarts re-arm from the first poll; the
  // committed-offset bound in planInputPartitions covers the gap)
  @volatile private var seen: Seq[String] = Nil
  @volatile private var lastBatchEnd: Long = startFloor

  private def appendOnlyOrDie(cur: Seq[String]): Unit = {
    val ok = cur.size >= seen.size && cur.take(seen.size) == seen
    if (!ok) throw new IllegalStateException(
      s"readStream.table at $tableRoot: the manifest's segment prefix " +
        s"changed under the stream (observed ${seen.size} segment(s), " +
        s"now ${cur.mkString(",")}) — the table was compacted or " +
        "republished. An append tail's offsets are segment positions, " +
        "which no rewrite can be mapped onto; for a table that compacts " +
        "or merges, consume the CHANGE FEED instead " +
        "(format(\"graft-cdf\") — its offsets are commit versions and it " +
        "diffs THROUGH folds), or restart with a fresh checkpoint")
    seen = cur
  }

  private def refuseUpserts(segs: Seq[String]): Unit =
    if (segs.nonEmpty) {
      val ups = AtomicPublish.upsertSidecarsFor(spark, tableRoot, segs)
      if (ups.nonEmpty) throw new IllegalStateException(
        s"readStream.table at $tableRoot: segment(s) " +
          s"${ups.keys.mkString(", ")} are merge-on-read segments — a " +
          "streaming tail delivers appends only, and serving updates or " +
          "deletes as appends would corrupt downstream state. Fold the " +
          "table and restart from a fresh checkpoint, or consume the " +
          "change feed (format(\"graft-cdf\"))")
    }

  private def value(o: Offset): Long = o match {
    case GraftTableOffset(n) => n
    case other => other.json.trim.toLong
  }

  override def initialOffset(): Offset = GraftTableOffset(startFloor)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(start, limit) drives this admission-controlled stream")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = AtomicPublish.currentSegments(spark, tableRoot)
    val fresh = cur.drop(seen.size)
    appendOnlyOrDie(cur)
    refuseUpserts(fresh)
    val floor = math.max(math.max(value(start), lastBatchEnd), startFloor)
    val avail = cur.size.toLong
    val capped = maxPer match {
      case Some(m) => math.min(avail, floor + m)
      case None => avail
    }
    GraftTableOffset(math.max(capped, floor))
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = value(start)
    val to = value(end)
    val cur = AtomicPublish.currentSegments(spark, tableRoot)
    if (cur.size < to) throw new IllegalStateException(
      s"readStream.table at $tableRoot: the manifest names ${cur.size} " +
        s"segment(s) but the stream has committed through $to — the " +
        "table was compacted or republished under the stream (or across " +
        "a restart); restart with a fresh checkpoint")
    appendOnlyOrDie(cur)
    lastBatchEnd = math.max(lastBatchEnd, to)
    val segDirs = cur.slice(from.toInt, to.toInt)
    refuseUpserts(segDirs)
    if (segDirs.isEmpty) return Array.empty
    val paths = segDirs.map(d => s"$tableRoot/$d")
    // fresh inner table over ONLY this batch's segments: schema pinned
    // (no re-inference), columns pruned to the stream's read schema —
    // partition planning and reader creation are the parquet DSv2's own
    val opts = new CaseInsensitiveStringMap(
      options.asCaseSensitiveMap().asScala.toMap
        .removedAll(Seq("path", "paths")).asJava)
    val table = new GraftReadOnlyTable(
      s"graft table stream $tableRoot [$from, $to)", spark, opts, paths,
      Some(tableSchema), classOf[GraftWriteRefused],
      Map.empty, Map.empty)
    val builder = table.newScanBuilder(opts)
    builder match {
      case s: SupportsPushDownRequiredColumns =>
        s.pruneColumns(streamReadSchema)
      case _ => ()
    }
    val batch = builder.build().toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions().map(p =>
      GraftStreamInputPartition(p, factory): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory

  override def deserializeOffset(json: String): Offset =
    GraftTableOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** A micro-batch partition paired with ITS batch's reader factory —
  * partitions and readers travel together, so two micro-batches with
  * different pruning could never cross wires. */
private[sources] case class GraftStreamInputPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Stateless dispatcher: unwraps the partition and delegates to the
  * factory it carries (columnar support included — vectorized parquet
  * reading works in micro-batches exactly as in batch scans). */
private[sources] object GraftStreamReaderFactory
  extends PartitionReaderFactory {

  private def unwrap(p: InputPartition): GraftStreamInputPartition =
    p match {
      case g: GraftStreamInputPartition => g
      case other => throw new IllegalStateException(
        s"graft table stream: foreign partition ${other.getClass.getName}")
    }

  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val g = unwrap(p)
    g.factory.createReader(g.inner)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val g = unwrap(p)
    g.factory.createColumnarReader(g.inner)
  }

  override def supportColumnarReads(p: InputPartition): Boolean = {
    val g = unwrap(p)
    g.factory.supportColumnarReads(g.inner)
  }
}
