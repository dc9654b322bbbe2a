package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All graded queries read through here so the scan path is uniform:
  * plain `spark.read.parquet`, which gives the vectorized columnar
  * reader, predicate pushdown and column pruning for free. At cluster
  * scale the same call reads a partitioned directory tree; nothing
  * here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-SCHEMA memo. Spark 4 launches a one-task schema-resolution
  // job for every `spark.read.parquet`; the graded keys call Tables()
  // per build, so a protocol key that re-reads its inputs across
  // commits paid that job each time. The memo holds only the inferred
  // StructType — never rows, never a plan — and the testdata
  // directories are static for a JVM's lifetime by contract
  // (scratch/published tables do not read through here). Keying by
  // (dir, name, nanosAsLong) rather than by session removes the
  // round-16 WeakHashMap-of-sessions shape, whose values (DataFrames)
  // strongly referenced their SparkSession and so pinned the weak keys
  // forever (ADVICE r16); the inferred schema is session-independent
  // except for the nanos-as-long legacy flag, which changes how a
  // TIMESTAMP(NANOS) column resolves, hence its place in the key.
  private val schemas = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanos = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val schema = schemas.computeIfAbsent((dir, name, nanos),
      _ => spark.read.parquet(path).schema)
    val raw = spark.read.schema(schema).parquet(path)
    if (name == "events") normalizeTs(raw) else raw
  }

  /** Normalize `events.ts` to canonical `TimestampType` regardless of the
    * physical parquet encoding the generator happened to use. Observed
    * encodings across testdata generations:
    *
    *   - TIMESTAMP(NANOS): Spark 4 reads as `LongType` nanos when
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set at session build
    *     by Verify/Bench/SparkSpec — a loader must not mutate session
    *     conf). Truncate ns→µs with integer division, bit-identical to
    *     DuckDB's ns→µs truncation, so oracles stay hash-exact.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *     `TimestampNTZType`. Cast to `TimestampType` — value-exact under
    *     the pinned UTC session timezone, and DuckDB reads the same µs
    *     wall-clock values, so oracles stay hash-exact.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true): already `TimestampType`;
    *     pass through.
    *
    * Every downstream consumer (`unix_millis`, `window()`, as-of joins)
    * can therefore assume exactly one dtype. EngineContractSpec asserts
    * this post-load contract for all tables so a future testdata
    * regeneration fails one loud assertion instead of N silent keys.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported dtype $other; " +
            "extend Tables.normalizeTs for this encoding")
    }
  }
}
