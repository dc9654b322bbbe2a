package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.AtomicPublish

/** STREAMING TAIL of a published table —
  * `spark.readStream.format("graft-stream").option("path", tableRoot)`
  * turns [[AtomicPublish.appendSegment]] commits into micro-batches:
  * the offset is the manifest's SEGMENT-PREFIX LENGTH, and each batch
  * reads exactly the newly committed segment directories. This closes
  * the loop between the LSM daily cycle and the streaming family — the
  * index/merge tables the engine grows by appends become live inputs
  * (downstream aggregation, replication, cache warming) without any
  * scan of already-consumed data: a day's batch costs a manifest read
  * plus that day's segments, never the corpus.
  *
  * Contract (the Delta streaming-source shape): the table must stay
  * APPEND-ONLY while tailed. A compaction or full republish rewrites
  * the prefix the offsets index, so the source verifies on every poll
  * that the previously observed segment list is still a prefix of the
  * current one, and FAILS LOUDLY (naming the cause and the restart
  * remedy) instead of silently re-reading rewritten data. Restart
  * recovery comes from the checkpoint: offsets are plain longs, and a
  * post-restart manifest shorter than the committed offset is refused
  * the same way.
  *
  * Why a V1 `Source` and a separate short name: Spark routes every
  * `FileDataSourceV2`'s streaming resolution through its V1 fallback
  * FileFormat, which [[GraftTableSource]] deliberately welds shut
  * (write-door safety) — and V2 `MicroBatchStream` is not consulted
  * for file-source providers at all. A plain [[StreamSourceProvider]]
  * under its own name sidesteps both: batch reads stay on `graft`,
  * streaming tails on `graft-stream`.
  */
class GraftStreamSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-stream needs the published table root: " +
        ".option(\"path\", tableRoot)"))

  /** Parse-and-validate the admission-control options. Called from
    * BOTH sourceSchema (plan creation — so a bad option fails the
    * `load()` synchronously, not the async stream thread) and
    * createSource (the values that actually drive the tail). */
  private sealed trait StartMode
  private case object StartEarliest extends StartMode
  private case object StartLatest extends StartMode
  private final case class StartVersion(v: Long) extends StartMode
  private final case class StartTimestamp(epochMs: Long) extends StartMode

  private def admissionOptions(parameters: Map[String, String])
      : (Option[Int], StartMode) = {
    val maxPer = parameters.get("maxSegmentsPerBatch").map { raw =>
      val n = raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft-stream: maxSegmentsPerBatch must be a positive int, got `$raw`"))
      require(n >= 1,
        s"graft-stream: maxSegmentsPerBatch must be >= 1, got $n")
      n
    }
    val startVersion = parameters.get("startingVersion").map { raw =>
      val v = raw.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-stream: startingVersion must be a commit version, got `$raw`"))
      require(v >= 1, s"graft-stream: startingVersion must be >= 1, got $v")
      require(!parameters.contains("startingOffset"),
        "graft-stream: startingOffset and startingVersion are mutually exclusive")
      require(!parameters.contains("startingTimestamp"),
        "graft-stream: startingTimestamp and startingVersion are mutually exclusive")
      StartVersion(v)
    }
    // wall-clock floor (Delta startingTimestamp): resolved to the
    // smallest commit AT OR AFTER the instant at source creation;
    // an instant past the newest commit arms the tail at the current
    // end (a position for a tail, not an error)
    val startTimestamp = parameters.get("startingTimestamp").map { raw =>
      require(!parameters.contains("startingOffset"),
        "graft-stream: startingOffset and startingTimestamp are mutually exclusive")
      StartTimestamp(AtomicPublish.parseInstantMs(raw,
        "graft-stream: startingTimestamp"))
    }
    require(startVersion.isEmpty || startTimestamp.isEmpty,
      "graft-stream: startingVersion and startingTimestamp are mutually exclusive")
    val start = startVersion.orElse(startTimestamp).getOrElse(
      parameters.getOrElse("startingOffset", "earliest") match {
        case "earliest" => StartEarliest
        case "latest" => StartLatest
        case other => throw new IllegalArgumentException(
          s"graft-stream: startingOffset must be `earliest` or `latest`, got `$other`")
      })
    (maxPer, start)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    admissionOptions(parameters) // validate at plan creation — loud, synchronous
    (shortName(), schema.getOrElse(
      AtomicPublish.read(sqlContext.sparkSession, tablePath(parameters)).schema))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = tablePath(parameters)
    val spark = sqlContext.sparkSession
    // ADMISSION CONTROL (round 15): `maxSegmentsPerBatch` caps how many
    // newly-committed segments one micro-batch may ingest — without it
    // a tail started against a long-established table (or resuming
    // after downtime) ingests the whole backlog as ONE batch, the exact
    // failure Delta's maxFilesPerTrigger exists for. `startingOffset`
    // = `latest` arms the tail at the CURRENT manifest length (consume
    // only future appends — replication/cache-warming tails);
    // `earliest` (default) replays from segment 0;
    // `startingVersion` = v arms it at commit v (consume v and later —
    // the Delta startingVersion shape, resolved through the version
    // log, loud if the log no longer holds v−1).
    val (maxPer, start) = admissionOptions(parameters)
    val startFloor: Long = start match {
      case StartEarliest => 0L
      case StartLatest =>
        AtomicPublish.currentSegments(spark, path).size.toLong
      case StartVersion(v) =>
        if (v == 1L) 0L
        else AtomicPublish.segmentsAt(spark, path, v - 1).size.toLong
      case StartTimestamp(ts) =>
        val v = AtomicPublish.versionSince(spark, path, ts)
        val latest = AtomicPublish.currentVersion(spark, path).getOrElse(0L)
        if (v == 1L) 0L
        else if (v > latest) // after the newest commit: future-only
          AtomicPublish.currentSegments(spark, path).size.toLong
        else AtomicPublish.segmentsAt(spark, path, v - 1).size.toLong
    }
    new GraftAppendTail(spark, path,
      schema.getOrElse(AtomicPublish.read(spark, path).schema),
      maxPer, startFloor)
  }
}

/** The V1 source instance: offset = segment-prefix length of the
  * manifest, batch (from, to] = segment dirs [from, to).
  *
  * `maxSegmentsPerBatch` caps each reported offset at
  * lastBatchEnd + cap; `startFloor` arms the initial floor (0 =
  * earliest, manifest length at creation = latest, version-log
  * resolution = startingVersion). On restart the engine
  * replays the last committed batch through [[getBatch]] before
  * polling [[getOffset]], which heals `lastBatchEnd` past the
  * checkpoint — and offsets never regress (`getBatch` ratchets it with
  * max, and an inverted slice reads empty rather than re-reading). */
private class GraftAppendTail(spark: SparkSession, tablePath: String,
                              override val schema: StructType,
                              maxSegmentsPerBatch: Option[Int],
                              startFloor: Long) extends Source {

  // the longest segment list this instance has observed — the
  // append-only witness (restarts re-arm it from the first poll; the
  // committed-offset bound below covers the restart gap)
  @volatile private var seen: Seq[String] = Nil

  private val initialFloor: Long = startFloor

  @volatile private var lastBatchEnd: Long = initialFloor

  private def appendOnlyOrDie(cur: Seq[String]): Unit = {
    val ok = cur.size >= seen.size && cur.take(seen.size) == seen
    if (!ok) throw new IllegalStateException(
      s"graft-stream at $tablePath: the manifest's segment prefix changed " +
        s"under the stream (observed ${seen.size} segment(s), now " +
        s"${cur.mkString(",")}) — the table was compacted or republished. " +
        "A raw-append tail's offsets are segment positions, which no " +
        "rewrite can be mapped onto; for a table that compacts or merges, " +
        "consume the CHANGE FEED instead (format(\"graft-cdf\") — its " +
        "offsets are commit versions and it diffs THROUGH folds), or " +
        "restart this query with a fresh checkpoint to re-consume the " +
        "rewritten table")
    seen = cur
  }

  /** Refuse UPSERT/DELETE segments in the tailed range: a merge
    * segment is an UPDATE or a RETRACTION, not an append — delivering
    * its rows as appends (or silently skipping a tombstone) corrupts
    * every downstream aggregate (the Delta ignoreChanges-unset
    * behavior; use AtomicPublish.changesBetween for a change feed).
    * Checked only over newly-arrived / about-to-be-served segments, so
    * the steady-state poll cost stays one manifest read. */
  private def refuseUpserts(segs: Seq[String]): Unit =
    if (segs.nonEmpty) {
      val ups = AtomicPublish.upsertSidecarsFor(spark, tablePath, segs)
      if (ups.nonEmpty) throw new IllegalStateException(
        s"graft-stream at $tablePath: segment(s) ${ups.keys.mkString(", ")} " +
          "are merge-on-read segments (MergeInto.upsertInto / deleteFrom) — " +
          "a streaming tail delivers appends only, and serving updates or " +
          "deletes as appends would corrupt downstream state. Fold the " +
          "table and restart the tail from a fresh checkpoint, tail an " +
          "append-only table, or consume AtomicPublish.changesBetween")
    }

  override def getOffset: Option[Offset] = {
    val cur = AtomicPublish.currentSegments(spark, tablePath)
    val fresh = cur.drop(seen.size)
    appendOnlyOrDie(cur)
    refuseUpserts(fresh)
    val avail = cur.size.toLong
    val capped = maxSegmentsPerBatch match {
      case Some(m) => math.min(avail, math.max(lastBatchEnd, initialFloor) + m)
      case None => avail
    }
    if (capped <= initialFloor) None else Some(LongOffset(capped))
  }

  private def offsetValue(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(offsetValue).getOrElse(initialFloor).toInt
    val to = offsetValue(end).toInt
    val cur = AtomicPublish.currentSegments(spark, tablePath)
    if (cur.size < to) throw new IllegalStateException(
      s"graft-stream at $tablePath: the manifest names ${cur.size} " +
        s"segment(s) but the stream has committed through $to — the table " +
        "was compacted or republished under the stream (or across a " +
        "restart); restart the query with a fresh checkpoint")
    appendOnlyOrDie(cur)
    lastBatchEnd = math.max(lastBatchEnd, to.toLong)
    val segDirs = cur.slice(from, to)
    refuseUpserts(segDirs)
    val segs = segDirs.map(d => s"$tablePath/$d")
    val batch =
      if (segs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
      else spark.read.schema(schema).parquet(segs: _*)
    org.apache.spark.sql.graftbridge.GraftSqlBridge
      .internalCreateStreamingDataFrame(spark,
        batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
