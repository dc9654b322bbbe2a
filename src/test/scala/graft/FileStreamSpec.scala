package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The real incremental path on the graded data: a file-source
  * readStream over events.parquet, processed with AvailableNow,
  * must reproduce the batch tumbling aggregate exactly (the
  * reference's "chunk loop ≡ one-pass batch" contract, upgraded).
  */
class FileStreamSpec extends SparkSpec {

  test("file readStream tumbling counts == batch window aggregate") {
    import spark.implicits._
    // Derive the stream schema from the file itself (the generator has
    // shipped ts as ns-long, µs-NTZ, and µs-LTZ across regenerations),
    // then normalize through the same boundary the batch path uses.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // file sources stream a DIRECTORY of files (the unbounded-ingest
    // model); stage the single test file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))

    val stream = graft.engine.Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream.format("memory").queryName("fs_tumble")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("fs_tumble")
      .select(unix_millis($"window.start").as("b"), $"event_type", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val batch = graft.engine.Tables(spark, sfDir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("b"), $"event_type", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("out-of-order chunk replay with watermark == batch answer") {
    // SURVEY §5.3's promise under ADVERSARIAL arrival order: the events
    // table chunked by hour, chunks replayed in a shuffled order (so
    // event time regresses between micro-batches), under a watermark
    // wide enough to cover the disorder. Nothing within the allowed
    // lateness may be dropped — the final append-mode output must equal
    // the batch windowed aggregate exactly.
    import spark.implicits._
    import graft.streaming.EventIn
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val events = graft.engine.Tables(spark, sfDir, "events")
      .select($"user_id", $"ts", $"value").as[EventIn]
      .collect().toSeq
    val minMs = events.map(_.ts.getTime).min
    val maxMs = events.map(_.ts.getTime).max
    val spanHours = ((maxMs - minMs) / 3600000L + 2L).toInt

    // Hour-of-epoch chunks, deterministically shuffled: consecutive
    // micro-batches jump around the full time range.
    val chunks = events.groupBy(_.ts.getTime / 3600000L).toSeq
    val shuffled = new scala.util.Random(42).shuffle(chunks).map(_._2)

    val input = MemoryStream[EventIn]
    val agg = input.toDF()
      .withWatermark("ts", s"$spanHours hours")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ooo_wm")
      .outputMode("append").start()
    shuffled.foreach { c => input.addData(c); q.processAllAvailable() }
    // Append mode only emits a window once the watermark passes its end;
    // two sentinel batches far past (span + watermark) flush every real
    // window. The sentinel's own window is excluded from the comparison.
    val sentinelTs = new java.sql.Timestamp(
      maxMs + (spanHours.toLong + 3) * 2 * 3600000L)
    input.addData(Seq(EventIn(-1L, sentinelTs, 0.0))); q.processAllAvailable()
    input.addData(Seq(EventIn(-1L, sentinelTs, 0.0))); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ooo_wm")
      .filter(unix_millis($"window.start") < sentinelTs.getTime)
      .select(unix_millis($"window.start").as("b"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = events.toDF()
      .groupBy(window($"ts", "1 hour")).agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("b"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.size > 3, "need several windows for the test to bite")
  }
}
