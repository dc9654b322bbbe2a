package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** The reference-shaped API surface (pandas-streaming
  * `StreamingDataFrame`, SURVEY.md §1 [P]) over a Spark `DataFrame`.
  *
  * pandas-streaming wraps "a function returning an iterator of pandas
  * chunks"; every method is lazy and composes a new wrapper. A Spark
  * `DataFrame` IS that abstraction, upgraded: the logical plan is the
  * composed pipeline, chunks are partitions (batch) or micro-batches
  * (streaming), and terminal ops drive execution. This veneer exists so
  * a reference user can port call sites 1:1; everything delegates to
  * the declarative API, so Catalyst sees through it — no opacity, full
  * pushdown/pruning/codegen.
  *
  * The same wrapper works over a streaming DataFrame (`readStream`):
  * transformations compose identically (`isStreaming` distinguishes);
  * terminal ops pick the right writer.
  */
final class StreamFrame(val df: DataFrame) {
  private def wrap(d: DataFrame) = new StreamFrame(d)

  // ---- projection / row ops (reference: __getitem__, assign, where, apply)
  /** reference `sdf["x"]`: single-column series view (see [[SeriesFrame]]). */
  def apply(colName: String): SeriesFrame = new SeriesFrame(df, colName)
  def series(colName: String): SeriesFrame = apply(colName)
  def select(cols: String*): StreamFrame = wrap(df.select(cols.map(col): _*))
  def selectCols(cols: Column*): StreamFrame = wrap(df.select(cols: _*))
  def where(cond: Column): StreamFrame = wrap(df.filter(cond))
  def withColumn(name: String, c: Column): StreamFrame = wrap(df.withColumn(name, c))
  def drop(cols: String*): StreamFrame = wrap(df.drop(cols: _*))
  def dropna(cols: Seq[String] = Nil): StreamFrame =
    wrap(if (cols.isEmpty) df.na.drop() else df.na.drop(cols))
  def fillna(value: Map[String, Any]): StreamFrame = wrap(df.na.fill(value))
  def sample(fraction: Double, seed: Long = 42L): StreamFrame =
    wrap(df.sample(withReplacement = false, fraction, seed))

  // ---- relational ops (reference: merge, concat, drop_duplicates, sort_values)
  def merge(right: StreamFrame, on: Seq[String], how: String = "inner"): StreamFrame =
    wrap(df.join(right.df, on, how))
  def concat(other: StreamFrame): StreamFrame =
    wrap(df.unionByName(other.df, allowMissingColumns = true))
  def dropDuplicates(cols: String*): StreamFrame =
    wrap(if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols))
  def sortValues(cols: Column*): StreamFrame = wrap(df.orderBy(cols: _*))
  def head(n: Int): StreamFrame = wrap(df.limit(n))

  // ---- chunking / materialization control (reference: chunksize knob,
  // dask repartition/persist)
  def repartition(n: Int): StreamFrame = wrap(df.repartition(n))
  def repartitionBy(n: Int, cols: Column*): StreamFrame =
    wrap(df.repartition(n, cols: _*))
  def coalescePartitions(n: Int): StreamFrame = wrap(df.coalesce(n))
  def cache(): StreamFrame = wrap(df.cache())
  def unpersist(): StreamFrame = wrap(df.unpersist())

  // ---- aggregation (reference: groupby(by, agg) — partial per chunk + re-agg,
  // which is exactly HashAggregateExec partial/final)
  def groupby(keys: Seq[String], aggs: Seq[Column]): StreamFrame =
    wrap(df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*))

  // ---- per-key ordered-window ops (pandas ewm / rolling / sessionize
  // surface; shared expressions with the graded queries via ops/RollingOps)
  def ewmMean(valueCol: String, keys: Seq[Column], order: Seq[Column],
              lookback: Int = 32): StreamFrame =
    wrap(graft.ops.RollingOps.ewmMean(df, valueCol, keys, order, lookback = lookback))
  def rollingMedian(valueCol: String, n: Int, keys: Seq[Column],
                    order: Seq[Column], minPeriods: Int = 1): StreamFrame =
    wrap(graft.ops.RollingOps.rollingMedian(df, valueCol, n, keys, order,
      minPeriods = minPeriods))
  def rollingQuantile(valueCol: String, n: Int, q: Double, keys: Seq[Column],
                      order: Seq[Column], minPeriods: Int = 1): StreamFrame =
    wrap(graft.ops.RollingOps.rollingQuantile(df, valueCol, n, q, keys, order,
      minPeriods = minPeriods))
  def rollingTrendCorr(valueCol: String, keys: Seq[Column], order: Seq[Column],
                       window: Int = 10): StreamFrame =
    wrap(graft.ops.RollingOps.rollingTrendCorr(df, valueCol, keys, order, window))
  def sessionize(tsCol: String, gapSeconds: Long, keys: Seq[Column],
                 order: Seq[Column]): StreamFrame =
    wrap(graft.ops.RollingOps.sessionize(df, tsCol, gapSeconds, keys, order))

  // ---- event-time ops (streaming upgrade of the chunk loop)
  def withWatermark(tsCol: String, delay: String): StreamFrame =
    wrap(df.withWatermark(tsCol, delay))
  def tumbling(tsCol: String, width: String, keys: Seq[String], aggs: Seq[Column]): StreamFrame =
    wrap(df.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))
  def sliding(tsCol: String, width: String, slide: String, keys: Seq[String],
              aggs: Seq[Column]): StreamFrame =
    wrap(df.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))
  def sessionized(tsCol: String, gap: String, keys: Seq[String], aggs: Seq[Column]): StreamFrame =
    wrap(df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))

  // ---- terminal ops (reference: to_df, to_csv, __iter__)
  def isStreaming: Boolean = df.isStreaming
  def toDF(): DataFrame = df
  def collectRows(): Array[Row] = df.collect()
  def toParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)
  def toCsv(path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  /** reference to_zip: csv parts packed into one archive (see [[ZipIo]]). */
  def toZip(path: String): Unit = ZipIo.writeZip(df, path)

  /** Streaming terminal: foreachBatch ≙ the reference's chunk callback. */
  def foreachChunk(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(f)
}

object StreamFrame {
  // reference: StreamingDataFrame.read_csv/read_json (chunked constructors)
  def readParquet(spark: SparkSession, path: String): StreamFrame =
    new StreamFrame(spark.read.parquet(path))
  def readCsv(spark: SparkSession, path: String, schema: StructType): StreamFrame =
    new StreamFrame(spark.read.schema(schema).option("header", "true").csv(path))
  def readJson(spark: SparkSession, path: String, schema: StructType): StreamFrame =
    new StreamFrame(spark.read.schema(schema).json(path))
  /** reference read_zip: parallel csv scan over the unpacked entries. */
  def readZip(spark: SparkSession, path: String, schema: StructType): StreamFrame =
    new StreamFrame(ZipIo.readZip(spark, path, schema))

  /** reference: read_df(df, chunksize) — chunk an in-memory frame. */
  def fromDF(df: DataFrame, nChunks: Int): StreamFrame =
    new StreamFrame(df.repartition(nChunks))

  // streaming constructors (schema mandatory — the "stable schema" contract)
  def streamParquet(spark: SparkSession, path: String, schema: StructType): StreamFrame =
    new StreamFrame(spark.readStream.schema(schema).parquet(path))
  def streamCsv(spark: SparkSession, path: String, schema: StructType): StreamFrame =
    new StreamFrame(spark.readStream.schema(schema).option("header", "true").csv(path))
}
