package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted range-partitioned layout — the dask `set_index`/divisions
  * analogue (SURVEY.md §2.1 [P]): a table written as one directory per
  * index range, so a query with a tight index predicate LISTS only the
  * overlapping directories instead of scanning the table.
  *
  * Divisions are explicit sorted boundaries (exactly dask's
  * `divisions`): partition i holds divisions(i-1) <= v < divisions(i)
  * (open-ended at both extremes). Because the boundaries are plan-time
  * literals, the reader can compute the overlapping partition-id range
  * CLIENT-SIDE from the query bounds — the same arithmetic dask does —
  * and emit it as a filter on the Hive partition column, which Spark
  * applies at file-listing time (`PartitionFilters` in the scan, i.e.
  * true directory pruning, not a row filter). Rows are additionally
  * clustered per partition and sorted by the index column at write
  * time, so parquet row-group min/max statistics prune WITHIN the
  * surviving partitions too.
  *
  * Boundaries travel as ISO-formatted strings: lexicographic string
  * order equals temporal order for ISO dates/timestamps and plain
  * string keys, which keeps the driver-side interval arithmetic a
  * one-line `count(_ <= v)` with no type dispatch.
  */
object RangeLayout {

  /** Write `df` under `path` partitioned into ranges of `colName` by
    * `divisions` (sorted ISO-string boundaries, cast to the column's
    * type in-plan). One cluster-by-partition shuffle, then a sorted
    * write — the pay-once layout cost `set_index` charges.
    */
  def write(df: DataFrame, path: String, colName: String,
            divisions: Seq[String]): Unit = {
    require(divisions == divisions.sorted, "divisions must be sorted")
    val dt = df.schema(colName).dataType
    val pid = divisions.foldLeft(lit(0)) { (acc, d) =>
      acc + when(col(colName) >= lit(d).cast(dt), 1).otherwise(0)
    }
    df.withColumn("__rp", pid)
      .repartition(col("__rp"))
      .sortWithinPartitions(colName)
      .write.mode("overwrite").partitionBy("__rp").parquet(path)
  }

  /** Partition id covering value `v` under `divisions` (ISO-string order). */
  def partitionId(divisions: Seq[String], v: String): Int =
    divisions.count(_ <= v)

  /** Rows with lower <= colName < upperExclusive, listing ONLY the
    * partition directories whose division range intersects the bounds.
    */
  def read(spark: SparkSession, path: String, colName: String,
           divisions: Seq[String], lower: String,
           upperExclusive: String): DataFrame = {
    val lo = partitionId(divisions, lower)
    // values strictly below `upper` can reach at most the partition
    // holding upper's immediate predecessor: count of divisions < upper.
    val hi = divisions.count(_ < upperExclusive)
    val df = spark.read.parquet(path)
    val dt = df.schema(colName).dataType
    df.filter(col("__rp").between(lo, hi))
      .filter(col(colName) >= lit(lower).cast(dt) &&
        col(colName) < lit(upperExclusive).cast(dt))
      .drop("__rp")
  }
}
