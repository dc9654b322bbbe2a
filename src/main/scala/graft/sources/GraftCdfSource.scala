package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.AtomicPublish

/** STREAMING CHANGE FEED of a published table —
  * `spark.readStream.format("graft-cdf").option("path", tableRoot)`
  * turns every commit into a micro-batch of TYPED CHANGES
  * ([[AtomicPublish.changesBetween]]): rows stamped `_change_type`
  * (`insert` / `update_postimage` / `delete`) + `_commit_version`.
  * This is the door the plain `graft-stream` tail deliberately refuses
  * to be: the tail serves APPENDS ONLY and fails loudly on merge
  * segments (delivering an upsert as an append corrupts downstream
  * state); the CDF source serves exactly those commits as what they
  * are, so a downstream table can APPLY them — the Delta
  * `readChangeFeed` consumer shape.
  *
  * Offsets are COMMIT VERSIONS from the version log. The source's
  * floor is `startingVersion` (serve commits ≥ N; default 2 — version
  * 1 is the base publish, a SNAPSHOT, not a change: consume
  * `readAt(1)` for it, then the feed) or `startingOffset=latest`
  * (only future commits). `maxCommitsPerBatch` bounds each
  * micro-batch's commit span (the admission-control shape of the
  * plain tail's maxSegmentsPerBatch).
  *
  * Contract and cost, documented honestly:
  *  - COMPACTIONS inside a batch window are fine: fold commits are
  *    content-preserving and declared in the version log, so
  *    changesBetween diffs through them (they emit zero change rows)
  *    — a consumer lagging across auto-folds keeps streaming as long
  *    as it stays inside the retention window. A RESTORE or republish
  *    (content rewrites) still fails the batch LOUDLY (changesBetween's
  *    guard) naming the remedy; restart with a fresh checkpoint to
  *    re-baseline on the rewritten table.
  *  - a batch containing merge commits pays the classification scan:
  *    the KEY-PRUNED keys of the batch-start snapshot (the liveness
  *    chain's ground truth) — ∝ the table's key column, per batch.
  *    Plain-append batches skip it entirely. This is the price of
  *    deriving the feed at READ time with zero per-write change
  *    files; writers stay untaxed.
  *  - the batch-start snapshot must still be inside the retention
  *    window: a tail lagging past `retentionMs` fails loudly at
  *    `segmentsAt`, never serves a guessed baseline.
  *  - schema is fixed at source creation (table schema +
  *    `_change_type` string + `_commit_version` long); a mid-stream
  *    schema evolution fails the batch loudly — restart to pick up
  *    the evolved schema.
  */
class GraftCdfSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf needs the published table root: .option(\"path\", tableRoot)"))

  private def feedSchema(spark: SparkSession, path: String): StructType =
    StructType(AtomicPublish.read(spark, path).schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = true),
      StructField("_commit_version", LongType, nullable = true)))

  /** Parse-and-validate options at plan creation (load() fails
    * synchronously on a bad option, not the async stream thread). */
  private def cdfOptions(parameters: Map[String, String])
      : (Option[Int], Option[Long], Option[Long], Boolean) = {
    val maxPer = parameters.get("maxCommitsPerBatch").map { raw =>
      val n = raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdf: maxCommitsPerBatch must be a positive int, got `$raw`"))
      require(n >= 1, s"graft-cdf: maxCommitsPerBatch must be >= 1, got $n")
      n
    }
    val startVer = parameters.get("startingVersion").map { raw =>
      val v = raw.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdf: startingVersion must be a commit version, got `$raw`"))
      require(v >= 2,
        s"graft-cdf: startingVersion must be >= 2, got $v — version 1 is " +
          "the base publish (a snapshot, not a change); read it via " +
          "versionAsOf and start the feed at 2")
      require(!parameters.contains("startingOffset"),
        "graft-cdf: startingOffset and startingVersion are mutually exclusive")
      require(!parameters.contains("startingTimestamp"),
        "graft-cdf: startingTimestamp and startingVersion are mutually exclusive")
      v
    }
    // wall-clock floor (Delta startingTimestamp): epoch ms or ISO-8601,
    // resolved at source creation to the smallest commit at-or-after
    // the instant (clamped up to 2 — version 1 is the base snapshot)
    val startTs = parameters.get("startingTimestamp").map { raw =>
      require(!parameters.contains("startingOffset"),
        "graft-cdf: startingOffset and startingTimestamp are mutually exclusive")
      AtomicPublish.parseInstantMs(raw, "graft-cdf: startingTimestamp")
    }
    val startLatest = parameters.getOrElse("startingOffset", "earliest") match {
      case "earliest" => false
      case "latest" => true
      case other => throw new IllegalArgumentException(
        s"graft-cdf: startingOffset must be `earliest` or `latest`, got `$other`")
    }
    (maxPer, startVer, startTs, startLatest)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    cdfOptions(parameters)
    (shortName(), schema.getOrElse(
      feedSchema(sqlContext.sparkSession, tablePath(parameters))))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = tablePath(parameters)
    val spark = sqlContext.sparkSession
    val (maxPer, startVer, startTs, startLatest) = cdfOptions(parameters)
    val floor: Long =
      if (startLatest)
        AtomicPublish.currentVersion(spark, path).getOrElse(
          throw new IllegalStateException(
            s"graft-cdf: no version log at $path — publish through " +
              "AtomicPublish first"))
      else startTs match {
        case Some(ts) =>
          // smallest commit at-or-after the instant, clamped to >= 2
          // (version 1 is the base snapshot); past-the-end arms at
          // the current version — future changes only
          val v = math.max(2L, AtomicPublish.versionSince(spark, path, ts))
          val latest = AtomicPublish.currentVersion(spark, path).getOrElse(1L)
          math.min(v, latest + 1) - 1
        case None => startVer.map(_ - 1).getOrElse(1L)
      }
    new GraftChangeTail(spark, path,
      schema.getOrElse(feedSchema(spark, path)), maxPer, floor)
  }
}

/** The V1 source instance: offset = COMMIT VERSION, batch
  * (fromVer, toVer] = `changesBetween(fromVer, toVer)`. Offsets never
  * regress (`getBatch` ratchets `lastBatchEnd`); on restart the engine
  * replays the last committed batch, which re-derives the same changes
  * from the immutable version log — deterministic replay as long as
  * the retention window still holds the baseline snapshot. */
private class GraftChangeTail(spark: SparkSession, tablePath: String,
                              override val schema: StructType,
                              maxCommitsPerBatch: Option[Int],
                              initialFloor: Long) extends Source {

  @volatile private var lastBatchEnd: Long = initialFloor

  override def getOffset: Option[Offset] = {
    val cur = AtomicPublish.currentVersion(spark, tablePath).getOrElse(0L)
    val capped = maxCommitsPerBatch match {
      case Some(m) => math.min(cur, math.max(lastBatchEnd, initialFloor) + m)
      case None => cur
    }
    if (capped <= initialFloor) None else Some(LongOffset(capped))
  }

  private def offsetValue(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(offsetValue).getOrElse(initialFloor)
    val to = offsetValue(end)
    lastBatchEnd = math.max(lastBatchEnd, to)
    val batch =
      if (from >= to)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val feed = AtomicPublish.changesBetween(spark, tablePath, from, to)
        val got = feed.schema.fieldNames.map(_.toLowerCase).toSeq
        val want = schema.fieldNames.map(_.toLowerCase).toSeq
        if (got != want) throw new IllegalStateException(
          s"graft-cdf at $tablePath: the feed's schema (${got.mkString(",")}) " +
            s"no longer matches the stream's (${want.mkString(",")}) — the " +
            "table's schema evolved under the stream; restart the query " +
            "with a fresh checkpoint to pick up the new schema")
        feed
      }
    org.apache.spark.sql.graftbridge.GraftSqlBridge
      .internalCreateStreamingDataFrame(spark,
        batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
