package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming sink path: stream a staged parquet directory through a
  * transformation into a parquet sink with checkpointing (the
  * reference's to_csv/to_parquet chunk-append loop, upgraded to
  * exactly-once file commits), then read the sink back and compare
  * with the batch result.
  */
class StreamSinkSpec extends SparkSpec {

  test("readStream -> transform -> parquet sink round-trips exactly") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_sink_src")
    val out = Files.createTempDirectory("graft_sink_out")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/orders.parquet"),
      src.resolve("part-0.parquet"))

    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))

    val q = spark.readStream.schema(schema).parquet(src.toString)
      .filter($"o_totalprice" > 100000.0)
      .select($"o_orderkey", $"o_totalprice")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = graft.engine.Tables(spark, sfDir, "orders")
      .filter($"o_totalprice" > 100000.0)
      .select($"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
