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
    // events.ts is TIMESTAMP(NANOS): read as raw longs (same conf the
    // batch path uses), convert to µs timestamps in the stream plan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

    // file sources stream a DIRECTORY of files (the unbounded-ingest
    // model); stage the single test file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
