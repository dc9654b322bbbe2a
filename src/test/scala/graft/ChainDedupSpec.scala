package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.ChainDedup
import graft.streaming.EventIn

/** TTL-chain dedup: exact batch semantics of graft.ops.ChainDedup
  * (suppression anchored to the previously KEPT event — the chain),
  * and the real incremental path through
  * `dropDuplicatesWithinWatermark`, checked against the streaming
  * guarantee: no two emitted same-key events closer than the delay,
  * and the first event of every key always emitted.
  */
class ChainDedupSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("chain anchors at the kept event, not the previous row") {
    import spark.implicits._
    // key 1 at t = 0, 5, 9, 12 minutes, ttl = 6 min:
    //   0 kept (first) -> 5 dropped (< 0+6) -> 9 kept (>= 0+6)
    //   -> 12 dropped (< 9+6).  A lag-gap filter would KEEP 12 and
    //   DROP 9 — this is the case that separates the two semantics.
    val df = Seq((1L, 0L, 10L), (1L, 5L, 11L), (1L, 9L, 12L), (1L, 12L, 13L),
        (2L, 3L, 20L))
      .toDF("k", "tmin", "id")
      .withColumn("tms", $"tmin" * 60000L)
    val kept = ChainDedup
      .keepFirstPerTtl(df, Seq("k"), "tms", ttlMs = 6 * 60000L, tieBreakCol = "id")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L, 20L))
  }

  test("equal timestamps: tie-break keeps exactly the lowest id") {
    import spark.implicits._
    val df = Seq((1L, 0L, 5L), (1L, 0L, 3L), (1L, 0L, 4L))
      .toDF("k", "tms", "id")
    val kept = ChainDedup
      .keepFirstPerTtl(df, Seq("k"), "tms", ttlMs = 1000L, tieBreakCol = "id")
      .select($"id").as[Long].collect().toSeq
    assert(kept === Seq(3L))
  }

  test("graded key equals an independent in-memory chain simulation") {
    import spark.implicits._
    val ttl = 2L * 24 * 3600 * 1000
    val ev = graft.engine.Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"event_type", unix_millis($"ts").as("tms"))
    val got = ChainDedup
      .keepFirstPerTtl(ev, Seq("user_id", "event_type"), "tms", ttl, "event_id")
      .select($"event_id").as[Long].collect().toSet
    val rows = ev.select($"user_id", $"event_type", $"tms", $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3, t._4))
    val exp = scala.collection.mutable.Set.empty[Long]
    var cur: (Long, String) = null
    var lastKept = Long.MinValue
    rows.foreach { case (u, et, tms, id) =>
      if (cur == null || (u, et) != cur) { cur = (u, et); lastKept = tms; exp += id }
      else if (tms >= lastKept + ttl) { lastKept = tms; exp += id }
    }
    assert(got === exp.toSet, s"got ${got.size} kept, expected ${exp.size}")
    assert(got.size < rows.length, "TTL never suppressed anything — test is vacuous")
  }

  test("streaming dropDuplicatesWithinWatermark honors the dedup guarantee") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    // 10-minute delay; same-key events within 10 min of each other must
    // dedup to one survivor; the first event of each key must survive.
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream.format("memory")
      .queryName("ttl_dedup_t").outputMode("append").start()
    input.addData(Seq(
      EventIn(1, ts(0), 1.0), EventIn(1, ts(4), 2.0),   // dup inside 10 min
      EventIn(2, ts(5), 3.0)))
    q.processAllAvailable()
    input.addData(Seq(
      EventIn(1, ts(7), 4.0),                            // still inside
      EventIn(2, ts(300), 5.0), EventIn(1, ts(300), 6.0), // 5 h later
      EventIn(3, ts(310), 7.0)))
    q.processAllAvailable()
    // advance the watermark far enough to flush all append-mode output
    input.addData(Seq(EventIn(9, ts(2000), 0.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ttl_dedup_t")
      .select($"user_id", unix_millis($"ts").as("tms"), $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // guarantee 1: first event of every key emitted
    assert(out.exists(e => e._1 == 1L && e._3 == 1.0))
    assert(out.exists(e => e._1 == 2L && e._3 == 3.0))
    assert(out.exists(e => e._1 == 3L && e._3 == 7.0))
    // guarantee 2: no two same-key emissions closer than the delay
    out.groupBy(_._1).values.foreach { es =>
      val sorted = es.map(_._2).sorted
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b - a >= 10 * 60000L, s"same-key emissions ${a} and ${b} within delay")
      }
    }
    // the within-delay duplicates (value 2.0, 4.0) must be suppressed
    assert(!out.exists(_._3 == 2.0) && !out.exists(_._3 == 4.0))
  }
}
