package graft

import org.apache.spark.sql.functions._

/** Checkpoint-RESTART recovery: the reference's core identity is a
  * resumable chunk loop, and the engine's upgrade story is
  * checkpointed state — so a streaming query stopped after ≥1
  * committed batch and REPLACED BY A NEW QUERY on the same checkpoint
  * must converge to exactly the batch answer, reading only the files
  * that arrived after the stop. Two shapes (stateful windowed agg;
  * dropDuplicatesWithinWatermark) × two state stores (default
  * HDFS-backed, RocksDB). Stop is graceful here; the state-restore
  * path exercised (offset log + state store load in a fresh query
  * instance) is the crash-recovery path, and the trailing
  * possibly-uncommitted batch case is covered by the sink-idempotence
  * specs (ForeachBatchUpsertSpec).
  */
class CheckpointRestartSpec extends SparkSpec {

  private def withStore[A](rocks: Boolean)(f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    if (rocks) spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else spark.conf.unset(key)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** events slice normalized through the batch boundary, with a
    * DETERMINISTIC split into two halves by user parity. */
  private def slice() = {
    import spark.implicits._
    graft.engine.Tables(spark, sfDir, "events")
      .filter($"user_id" < 300)
      .select($"user_id", $"ts", $"value", $"event_type")
  }

  private def stageDirs(tag: String) = {
    val in = java.nio.file.Files.createTempDirectory(s"graft_cpr_${tag}_in")
    val cp = java.nio.file.Files.createTempDirectory(s"graft_cpr_${tag}_cp")
    (in.toString, cp.toString)
  }

  private def writeChunk(df: org.apache.spark.sql.DataFrame, dir: String,
                         name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cpr_chunk")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, name))
  }

  test("windowed agg restarts from the checkpoint: state restored, old files not re-read") {
    import spark.implicits._
    for (rocks <- Seq(false, true)) withStore(rocks) {
      val tag = if (rocks) "rocks" else "hdfs"
      val (in, cp) = stageDirs(s"agg_$tag")
      val base = slice()
      val half1 = base.filter($"user_id" % 2 === 0)
      val half2 = base.filter($"user_id" % 2 === 1)
      writeChunk(half1, in, "chunk-0.parquet")
      val schema = spark.read.parquet(s"$in/chunk-0.parquet").schema

      def start(name: String) = graft.engine.Tables.normalizeTs(
          spark.readStream.schema(schema).parquet(in))
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .start()

      // FIRST life: process half 1, require >= 1 committed batch, stop.
      val q1 = start(s"cpr_agg_${tag}_a")
      q1.processAllAvailable()
      val committed1 = q1.recentProgress.map(_.numInputRows).sum
      assert(committed1 === half1.count(), "first life must commit half 1")
      q1.stop()

      // the rest of the corpus arrives while no query is running
      writeChunk(half2, in, "chunk-1.parquet")

      // SECOND life: NEW query, SAME checkpoint. It must (a) restore
      // the aggregation state — the complete-mode output below covers
      // half 1 it never read — and (b) consult the file-source log:
      // only the new file is processed.
      val q2 = start(s"cpr_agg_${tag}_b")
      q2.processAllAvailable()
      val readBySecond = q2.recentProgress.map(_.numInputRows).sum
      q2.stop()
      assert(readBySecond === half2.count(),
        s"second life re-read old files: $readBySecond rows")

      val streamed = spark.table(s"cpr_agg_${tag}_b")
        .select(unix_millis($"window.start").as("b"), $"event_type", $"n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = base
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_millis($"window.start").as("b"), $"event_type", $"n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch, s"[$tag] restart result != batch oracle")
      assert(streamed.nonEmpty)
    }
  }

  test("dropDuplicatesWithinWatermark restarts: cross-restart duplicates still dedup (parquet sink)") {
    import spark.implicits._
    for (rocks <- Seq(false, true)) withStore(rocks) {
      val tag = if (rocks) "rocks" else "hdfs"
      val (in, cp) = stageDirs(s"dd_$tag")
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_cpr_dd_${tag}_out").toString
      val base = slice()
      val half1 = base.filter($"user_id" % 2 === 0)
      // half 2 carries DUPLICATES OF HALF-1 ROWS across the restart
      // boundary: if the dedup state were lost, these re-emit and the
      // final table diverges from the batch answer.
      val replayed = half1.orderBy($"user_id", $"ts", $"value").limit(50)
      val half2 = base.filter($"user_id" % 2 === 1).unionByName(replayed)
      writeChunk(half1, in, "chunk-0.parquet")
      val schema = spark.read.parquet(s"$in/chunk-0.parquet").schema

      def start() = graft.engine.Tables.normalizeTs(
          spark.readStream.schema(schema).parquet(in))
        .withWatermark("ts", "365 days")
        .dropDuplicatesWithinWatermark("user_id", "ts", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .start()

      val q1 = start()
      q1.processAllAvailable()
      assert(q1.recentProgress.map(_.numInputRows).sum === half1.count())
      q1.stop()

      writeChunk(half2, in, "chunk-1.parquet")

      val q2 = start()
      q2.processAllAvailable()
      val readBySecond = q2.recentProgress.map(_.numInputRows).sum
      q2.stop()
      assert(readBySecond === half2.count(),
        s"second life re-read old files: $readBySecond rows")

      // the parquet sink's commit log makes the directory exactly-once
      // across the restart; the final table must equal the batch dedup
      val streamed = spark.read.parquet(out)
        .select($"user_id", unix_millis($"ts").as("t"), $"value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val batch = graft.engine.Tables(spark, sfDir, "events")
        .filter($"user_id" < 300)
        .dropDuplicates("user_id", "ts", "value")
        .select($"user_id", unix_millis($"ts").as("t"), $"value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(streamed === batch, s"[$tag] restart dedup != batch dedup")
      assert(streamed.nonEmpty)
    }
  }
}
