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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // unless spark.sql.legacy.parquet.nanosAsLong=true is set AT
      // SESSION BUILD (Verify/Bench/tools/SparkSpec all set it — a
      // loader must not mutate session conf). Read the raw nanos and
      // truncate to µs with integer division — bit-identical to DuckDB
      // 1.0.0's ns→µs truncation (verified, SURVEY.md §1), so oracles
      // stay hash-exact.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
