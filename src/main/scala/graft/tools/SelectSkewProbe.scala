package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the skew-armored selection path
  * (DistributedSelect.atRanks after the round-10 (value,count)
  * collapse): quartiles over `lineitem.l_quantity` — a DEGENERATE
  * column with only 50 distinct values, so every percentile bucket is
  * one hot value holding ~2% of the corpus. Before the collapse this
  * is exactly the shape that re-created the single-task sort the
  * operator exists to avoid; after it, each surviving bucket's local
  * sort touches ≤ 50 rows regardless of corpus size. Prints the
  * selected quartile values (sanity) and the wall.
  *
  * Usage: graft.tools.SelectSkewProbe [sfDir]
  */
object SelectSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = graft.engine.Tables(spark, dir, "lineitem")
      .select($"l_quantity", $"l_orderkey")
    val t0 = System.nanoTime()
    val rows = graft.ops.DistributedSelect.atRanks(
        li, "l_quantity", "l_orderkey",
        n => Seq(ceil(n / 4d).cast("long"), ceil(n / 2d).cast("long"),
          ceil(n * 3 / 4d).cast("long")))
      .orderBy($"rank").collect()
    val wall = (System.nanoTime() - t0) / 1e9
    rows.foreach(r => println(s"rank=${r.get(0)} v=${r.get(1)}"))
    println(f"selectskew wall=$wall%.2f s over ${li.count()} rows")
    spark.stop()
  }
}
