package graft

import org.apache.spark.sql.functions._

/** Incremental materialization via foreachBatch upsert — the sink-side
  * half of streaming exactly-once. Structured Streaming guarantees
  * AT-LEAST-ONCE delivery of micro-batches to foreachBatch; end-to-end
  * exactly-once is recovered by making the sink write IDEMPOTENT
  * (keyed upsert of update-mode running aggregates: re-applying a
  * delivered batch rewrites the same rows with the same values). This
  * spec replays the events table in chunks through a MemoryStream,
  * upserts every batch TWICE (simulated redelivery), and requires the
  * materialized table to equal the one-pass batch aggregate exactly.
  */
class ForeachBatchUpsertSpec extends SparkSpec {

  test("update-mode foreachBatch upsert is idempotent under redelivery") {
    import spark.implicits._
    import graft.streaming.EventIn
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val events = graft.engine.Tables(spark, sfDir, "events")
      .filter($"user_id" < 30)
      .select($"user_id", $"ts", $"value").as[EventIn]
      .collect().toSeq
    assert(events.nonEmpty)
    val chunks = events.grouped(200).toSeq

    // The materialized target: key → (n_events, exact-decimal sum).
    val target =
      new java.util.concurrent.ConcurrentHashMap[Long, (Long, java.math.BigDecimal)]()

    val input = MemoryStream[EventIn]
    val agg = input.toDF()
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).as("s"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect() // test-sized; a real sink writes per-partition
        // Apply twice: at-least-once redelivery must be a no-op the
        // second time because the upsert is keyed and carries the NEW
        // running total (update mode), not a delta.
        (0 until 2).foreach { _ =>
          rows.foreach { r =>
            target.put(r.getLong(0), (r.getLong(1), r.getDecimal(2)))
          }
        }
      }
      .start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val expect = events.toDF()
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap

    assert(target.size === expect.size)
    expect.foreach { case (k, (n, s)) =>
      val (gn, gs) = target.get(k)
      assert(gn === n, s"user $k count")
      assert(gs.compareTo(s) === 0, s"user $k sum: got $gs want $s")
    }
  }

  test("append-shaped foreachBatch sink: txn marks absorb redelivery") {
    // The harder exactly-once case: an APPEND sink has no natural
    // idempotence (re-appending a delivered batch lands its rows
    // twice). appendSegmentTxn keyed by (sink identity, batchId) is
    // the Delta txnAppId/txnVersion recovery: the replayed apply is
    // recognized at-or-below the high-water mark and skipped before
    // staging. Every batch here is applied TWICE; the published table
    // must still equal the input exactly once.
    import spark.implicits._
    import graft.streaming.EventIn
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.AtomicPublish

    val events = graft.engine.Tables(spark, sfDir, "events")
      .filter($"user_id" < 20)
      .select($"user_id", $"ts", $"value").as[EventIn]
      .collect().toSeq
    assert(events.nonEmpty)
    val table = graft.engine.Scratch.dir("spec_txn_stream_sink")
    AtomicPublish.publish(spark, table)(p =>
      spark.emptyDataset[EventIn].toDF().write.parquet(p))

    val input = MemoryStream[EventIn]
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.collect() // test-sized; a real sink writes per-partition
        val local = rows.map(r =>
          EventIn(r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSeq
        (0 until 2).foreach { _ => // simulated redelivery
          AtomicPublish.appendSegmentTxn(spark, table, "evsink", id)(p =>
            local.toDF("user_id", "ts", "value").write.parquet(p))
        }
        ()
      }
      .start()
    events.grouped(150).foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val got = AtomicPublish.read(spark, table)
      .agg(count(lit(1)), sum($"value".cast("decimal(18,2)"))).head()
    val want = events.toDF()
      .agg(count(lit(1)), sum($"value".cast("decimal(18,2)"))).head()
    assert(got.getLong(0) === want.getLong(0),
      s"double-applied appends leaked: ${got.getLong(0)} vs ${want.getLong(0)}")
    assert(got.getDecimal(1).compareTo(want.getDecimal(1)) === 0)
  }
}
