package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** EXECUTOR-FED replay harness for the graded streaming keys: stages a
  * bounded DataFrame as contiguous id-range parquet chunks in a fresh
  * stream-input directory and drives a FILE-SOURCE streaming query over
  * them — one chunk landed, one micro-batch drained, in order.
  *
  * This replaces the driver `collect()` → MemoryStream feed the keys
  * used through round 13. That feed was a fine grading harness at
  * sf0.01, but it materialized the ENTIRE stream input on the driver —
  * the reason the sf100 streaming decade legs needed an 80 GB
  * single-JVM heap. Here every chunk is written BY EXECUTORS
  * (`src.filter(range).write`) and read back through the same
  * file-source machinery a production ingest tails, so driver memory is
  * independent of stream size and the keys run the decade legs at
  * default heap.
  *
  * Ordering contract: chunks are ranges of a monotone id column, landed
  * and drained strictly in range order — no later id ever arrives in an
  * EARLIER micro-batch than a smaller id, which is the property the
  * first-occurrence dedup semantics key on. WITHIN a micro-batch no row
  * order is promised (none was under MemoryStream either — groupByKey
  * shuffles it); the stateful ops are within-batch order-independent by
  * construction.
  */
object FileReplay {

  /** Stage `src` into `nChunks` contiguous ranges of `orderCol` (a
    * numeric id), start the query `start` builds over the staged
    * directory's file source, and drain one micro-batch per chunk in
    * range order. The query is stopped before returning. Driver-side
    * data: ONE (min, max) row — never the stream. */
  def replay(spark: SparkSession, src: DataFrame, orderCol: String,
             nChunks: Int)(start: DataFrame => StreamingQuery): Unit = {
    require(nChunks >= 1, s"nChunks must be >= 1: $nChunks")
    // INTEGRAL order column required up front: the chunk bounds are
    // computed on a long cast but the range filters apply to the RAW
    // column — a fractional order value below the truncated minimum
    // (e.g. -3.7 vs lo=-3) would be staged into NO chunk and silently
    // vanish, the exact hazard the NULL guard below refuses loudly.
    locally {
      import org.apache.spark.sql.types._
      val dt = src.schema(orderCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"replay order column `$orderCol` must be an integral type " +
          s"(byte/short/int/long), got $dt — cast it (unix_millis for " +
          "timestamps) so range chunking is exact")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val mm = src.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long"),
      count(lit(1)), count(col(orderCol))).collect().head
    require(!mm.isNullAt(0), s"replay source is empty (no $orderCol values)")
    // range filters are null-false: a NULL order value would be staged
    // into NO chunk and silently vanish from the stream — refuse loudly
    require(mm.getLong(2) == mm.getLong(3),
      s"replay order column `$orderCol` has ${mm.getLong(2) - mm.getLong(3)} " +
        "NULL value(s): range chunking would silently drop those rows — " +
        "filter or default them first")
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    // ceil-split the id span into contiguous [from, to) ranges; the last
    // range is closed at max+1 so every row lands in exactly one chunk
    val width = math.max(1L, (hi - lo) / nChunks + 1L)
    val ranges = (0 until nChunks).map { k =>
      (lo + k * width, math.min(lo + (k + 1) * width, hi + 1))
    }.filter(r => r._1 < r._2)
    def land(r: (Long, Long)): Unit =
      graft.engine.JobLabel(spark, s"replay: land chunk [${r._1},${r._2})") {
        src.filter(col(orderCol) >= r._1 && col(orderCol) < r._2)
          .write.mode("append").parquet(dir)
      }
    land(ranges.head)
    // schema from the landed files, not src.schema: the files are the
    // contract the source reads (nullability normalized by parquet).
    // Footer-read on the driver — the chunks are Spark-written, so the
    // footer carries the exact schema and the datasource-inference
    // job every replay otherwise launches is pure overhead.
    val schema = graft.ops.AtomicPublish.segmentSchemaFromFooter(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)
    val q = start(spark.readStream.schema(schema).parquet(dir))
    try {
      q.processAllAvailable()
      ranges.tail.foreach { r => land(r); q.processAllAvailable() }
    } finally {
      q.stop()
      // the staged chunks exist only to feed this query; every caller
      // consumes results through its sink (memory table / foreachBatch
      // target / published table), so reclaim the scratch now instead
      // of leaking a stream-sized copy per run
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      } catch { case _: java.io.IOException => () }
    }
  }
}
