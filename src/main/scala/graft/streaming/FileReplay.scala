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
    * data: ONE (min, max) row — never the stream.
    *
    * `boundsOver` (round 17): an optional CHEAP frame to compute the
    * chunk bounds on instead of `src`. The bounds pass only needs
    * min/max of the order column, but when `src` carries an expensive
    * generator projection (minhash signatures exploded to band rows,
    * embedding probe cells), column pruning cannot remove the generator
    * and the bounds job re-paid the full projection — for the minhash
    * stream keys that was a SECOND corpus signature pass. Callers pass
    * the pre-projection id source (same ids or a superset range);
    * every staged row still lands in exactly one chunk (verified by
    * the staged-partition check below, which also catches NULL order
    * values), and the stateful keys' outputs are chunk-boundary
    * invariant by construction (within-batch order-independent,
    * monotone across batches — the spec-pinned property). */
  def replay(spark: SparkSession, src: DataFrame, orderCol: String,
             nChunks: Int, boundsOver: Option[DataFrame] = None)
            (start: DataFrame => StreamingQuery): Unit = {
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
    val mm = boundsOver.getOrElse(src)
      .agg(min(col(orderCol)).cast("long"),
        max(col(orderCol)).cast("long")).collect().head
    require(!mm.isNullAt(0), s"replay source is empty (no $orderCol values)")
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    // ceil-split the id span into contiguous [from, to) ranges; the last
    // range is closed at max+1 so every row lands in exactly one chunk
    val width = math.max(1L, (hi - lo) / nChunks + 1L)
    val ranges = (0 until nChunks).map { k =>
      (lo + k * width, math.min(lo + (k + 1) * width, hi + 1))
    }.filter(r => r._1 < r._2)
    // ONE staging pass for ALL chunks (round 17, guide §1.2): the
    // pre-round-17 shape ran one filter+write job PER CHUNK — n jobs
    // scanning the source n times for disjoint slices. Here a single
    // write partitioned by chunk ordinal stages every slice in one
    // source pass (partitionBy adds no shuffle — each task writes its
    // rows to their chunk directory), and "landing" chunk k for the
    // file-source query becomes a driver-side RENAME of k's files into
    // the watched directory — zero jobs, same files, same strict
    // range-order arrival the dedup semantics key on. File names are
    // prefixed with the chunk ordinal: two chunk directories written by
    // one task share a part-file name, and the flat watched dir must
    // never collide.
    val stageRoot = java.nio.file.Files
      .createTempDirectory("graft_replay_stage").toString
    val stageDir = s"$stageRoot/chunks"
    val chunkCol = "__graft_replay_chunk"
    graft.engine.JobLabel(spark,
      s"replay: stage ${ranges.length} chunk(s) of [$lo,$hi]") {
      // `div` = exact integral division (a double `/` would round past
      // 2^53); orderCol >= lo always, so the quotient is the 0-based
      // range ordinal of the ceil-split above
      src.withColumn(chunkCol,
          expr(s"(CAST(`$orderCol` AS BIGINT) - ${lo}L) div ${width}L"))
        .write.partitionBy(chunkCol).parquet(stageDir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // LOSS-PROOF staging check (replaces the pre-round-17 count-based
    // null probe, and is strictly stronger): every row lands in SOME
    // partition directory — a NULL order value lands in the Hive
    // default partition and an id outside the declared bounds lands in
    // an out-of-range chunk ordinal; either is a row the range-ordered
    // landing loop below would silently never deliver, so refuse loudly.
    fs.listStatus(new org.apache.hadoop.fs.Path(stageDir))
      .filter(_.isDirectory).foreach { d =>
        val k = d.getPath.getName.stripPrefix(s"$chunkCol=").toLongOption
        require(k.exists(kk => kk >= 0 && kk < ranges.length),
          s"replay: staged rows outside every declared chunk " +
            s"(${d.getPath.getName}) — NULL `$orderCol` values or bounds " +
            "narrower than the data; filter/default them first")
      }
    def land(k: Int): Unit = {
      val from = new org.apache.hadoop.fs.Path(stageDir, s"$chunkCol=$k")
      if (fs.exists(from)) fs.listStatus(from).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(dir, s"c$k-$n")),
            s"replay: failed to land $n into $dir")
      }
    }
    land(0)
    // schema from the landed files, not src.schema: the files are the
    // contract the source reads (nullability normalized by parquet; the
    // chunk ordinal is a partition column, absent from the data files).
    // Footer-read on the driver — the chunks are Spark-written, so the
    // footer carries the exact schema and the datasource-inference
    // job every replay otherwise launches is pure overhead.
    val schema = graft.ops.AtomicPublish.segmentSchemaFromFooter(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)
    val q = start(spark.readStream.schema(schema).parquet(dir))
    try {
      q.processAllAvailable()
      (1 until ranges.length).foreach { k => land(k); q.processAllAvailable() }
    } finally {
      q.stop()
      // the staged chunks exist only to feed this query; every caller
      // consumes results through its sink (memory table / foreachBatch
      // target / published table), so reclaim the scratch now instead
      // of leaking a stream-sized copy per run
      try {
        for (d <- Seq(dir, stageRoot)) {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
        ()
      } catch { case _: java.io.IOException => () }
    }
  }
}
