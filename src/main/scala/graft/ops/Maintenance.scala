package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: MERGE upsert and small-file
  * compaction. Both are first-class jobs in a 100 TB pipeline — the
  * first is how incremental ingest lands (CDC batches, label fixes,
  * re-scraped documents), the second is how a table stays scannable
  * after thousands of incremental writes have fragmented it.
  */
object MergeInto {

  /** SCD-1 MERGE INTO: rows of `source` win on key match (UPDATE),
    * land on no match (INSERT); unmatched `target` rows pass through.
    * Schemas must be union-compatible by name.
    *
    * Scale shape: ONE left-anti shuffle join of target against the
    * distinct source keys plus a union — no full-outer join (whose
    * coalesce-per-column plan reshuffles BOTH sides and breaks column
    * pruning). With the target bucketed on the key (engine.Scratch) the
    * anti join is shuffle-free on the big side, which is the layout a
    * real lakehouse MERGE exploits.
    */
  def upsert(target: DataFrame, source: DataFrame,
             keys: Seq[String]): DataFrame =
    target
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source)
}

object Compact {

  /** Rewrite a fragmented parquet directory into ~`targetBytes` files:
    * list the leaves, size the output partition count from real bytes,
    * and round-robin repartition into the rewrite. Returns the
    * compacted-file DataFrame reader.
    *
    * At 100 TB compaction runs per partition-directory (this function's
    * unit of work), bin-packing each independently — never a global
    * rewrite of the table. The shuffle it pays is the point: it buys
    * every later scan fewer, larger, row-group-aligned files.
    */
  def rewrite(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(parts)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** Data-file count of a parquet directory (compaction evidence). */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
