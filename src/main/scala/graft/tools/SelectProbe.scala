package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose DistributedSelect.atRanks cost at a given sf
  * dir — times the boundary sketch, one bucketing pass (the HOF bucket
  * assignment), and the full quartiles-shaped selection, to attribute
  * a scale blow-up to its stage. Usage: graft.tools.SelectProbe [sfDir]
  */
object SelectProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_totalprice"), col("o_orderkey"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    time("scan+count")(df.count())
    val ps = (1 until 32).map(i => i.toDouble / 32)
    val bounds = df.agg(
      percentile_approx(col("o_totalprice"), typedLit(ps), lit(1000)).as("__bnds"),
      count(lit(1)).as("__n"))
    time("boundary sketch")(bounds.collect())
    val bucketed = df.select(col("o_totalprice").as("__v"), col("o_orderkey").as("__k"))
      .crossJoin(broadcast(bounds))
      .withColumn("__b",
        aggregate(col("__bnds"), lit(0),
          (acc, b) => acc + when(col("__v") > b, 1).otherwise(0)))
      .drop("__bnds")
    time("bucket HOF pass x1")(bucketed.count())
    time("bucket counts agg")(
      bucketed.groupBy(col("__b")).agg(count(lit(1))).collect())
    val sel = graft.ops.DistributedSelect.atRanks(
      df, "o_totalprice", "o_orderkey",
      n => Seq(ceil(lit(0.25) * n).cast("long"), ceil(lit(0.5) * n).cast("long"),
        ceil(lit(0.75) * n).cast("long")))
    time("full atRanks")(sel.count())
    time("full atRanks again")(
      graft.ops.DistributedSelect.atRanks(df, "o_totalprice", "o_orderkey",
        n => Seq(ceil(lit(0.5) * n).cast("long"))).count())
    spark.stop()
  }
}
