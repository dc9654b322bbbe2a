package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.engine.StreamFrame
import graft.streaming.{EventIn, Stateful}

/** Streaming-vs-batch equivalence (SURVEY.md §5.3): the same events
  * replayed through MemoryStream in several micro-batches must produce
  * the same final tables as the batch plan; late data beyond the
  * watermark must be dropped. No DuckDB analogue — this is the part of
  * the semantics only the streaming engine can exhibit.
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private val batch1 = Seq(
    EventIn(1, ts(0), 1.0), EventIn(1, ts(5), 2.0), EventIn(2, ts(7), 5.0))
  private val batch2 = Seq(
    EventIn(1, ts(16), 3.0), EventIn(2, ts(18), 7.0), EventIn(3, ts(59), 11.0))

  test("tumbling window: streamed micro-batches == batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val sf = new StreamFrame(input.toDF())
      .tumbling("ts", "10 minutes", Seq(), Seq(count(lit(1)).as("n")))
    val q = sf.toDF().writeStream.format("memory")
      .queryName("tumble_t").outputMode("complete").start()
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumble_t")
      .select(unix_millis($"window.start").as("b"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = (batch1 ++ batch2).toDF()
      .groupBy(window($"ts", "10 minutes")).agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("stateful running counts: final state == batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val q = Stateful.runningUserStats(input.toDS())
      .toDF().writeStream.format("memory")
      .queryName("stateful_t").outputMode("update").start()
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()

    // Last emission per key is the final state.
    val finalState = spark.table("stateful_t")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"total_cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = (batch1 ++ batch2).groupBy(_.user_id).map { case (u, es) =>
      (u, es.size.toLong, es.map(e => math.round(e.value * 100)).sum)
    }.toSet
    assert(finalState === batch)
  }

  test("watermark drops events later than the threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val agg = new StreamFrame(input.toDF())
      .withWatermark("ts", "10 minutes")
      .tumbling("ts", "10 minutes", Seq(), Seq(count(lit(1)).as("n")))
    val q = agg.toDF().writeStream.format("memory")
      .queryName("wm_t").outputMode("append").start()
    // Advance event time to 01:00, pushing the watermark to 00:50...
    input.addData(Seq(EventIn(1, ts(0), 1.0),
      EventIn(1, Timestamp.valueOf("2024-01-01 01:00:00"), 1.0)))
    q.processAllAvailable()
    // ...then send a very late event for the (already finalized) 00:00 window.
    input.addData(Seq(EventIn(9, ts(1), 99.0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_t")
      .select(unix_millis($"window.start").as("b"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // The 00:00 window was emitted with exactly 1 event; the late one was dropped.
    assert(rows.get(w0).contains(1L))
  }

  test("stateful counts run unchanged on the RocksDB state store") {
    // The 100 TB state path: the default HDFS-backed store holds every
    // key's state on-heap per executor; RocksDB spills to local disk and
    // is the provider you'd run with TB-scale streaming state. Prove the
    // operator is provider-agnostic by running the same stateful query
    // on a RocksDB-backed session (isolated via newSession so the
    // shared-suite session keeps the default provider).
    import spark.implicits._
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = rocks.sqlContext
    val input = MemoryStream[EventIn]
    val q = Stateful.runningUserStats(input.toDS())
      .toDF().writeStream.format("memory")
      .queryName("stateful_rocks_t").outputMode("update").start()
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()

    val finalState = rocks.table("stateful_rocks_t")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"total_cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = (batch1 ++ batch2).groupBy(_.user_id).map { case (u, es) =>
      (u, es.size.toLong, es.map(e => math.round(e.value * 100)).sum)
    }.toSet
    assert(finalState === batch)
  }

  test("streaming dropDuplicates dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val q = new StreamFrame(input.toDF())
      .dropDuplicates("user_id")
      .toDF().writeStream.format("memory")
      .queryName("dedup_t").outputMode("append").start()
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch1); q.processAllAvailable() // exact replay: all dups
    input.addData(batch2); q.processAllAvailable()
    q.stop()
    val users = spark.table("dedup_t").select($"user_id")
      .collect().map(_.getLong(0)).toSeq
    assert(users.sorted === Seq(1L, 2L, 3L))
  }

  test("stream-static join enriches against a static table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[EventIn]
    val q = new StreamFrame(input.toDF())
      .merge(new StreamFrame(dim), Seq("user_id"), "inner")
      .toDF().writeStream.format("memory")
      .queryName("ssj_t").outputMode("append").start()
    input.addData(batch1 ++ batch2); q.processAllAvailable()
    q.stop()
    val tiers = spark.table("ssj_t").groupBy($"tier").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tiers === Map("gold" -> 3L, "silver" -> 2L)) // user 3 has no tier
  }
}
