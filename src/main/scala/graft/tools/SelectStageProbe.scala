package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev probe: per-stage timings of the DistributedSelect shape on
  * `orders.o_totalprice` — which pass dominates at a given sf?
  * Usage: graft.tools.SelectStageProbe <sfDir>
  */
object SelectStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label")
      r
    }

    val df = Tables(spark, dir, "orders").select(col("o_totalprice"), col("o_orderkey"))
    time("bare scan count")(df.count())
    val ps = (1 until 32).map(i => i.toDouble / 32)
    time("sketch acc=100")(df.agg(
      percentile_approx(col("o_totalprice"), typedLit(ps), lit(100)), count(lit(1))).collect())
    time("sketch acc=1000")(df.agg(
      percentile_approx(col("o_totalprice"), typedLit(ps), lit(1000)), count(lit(1))).collect())
    time("exact min/max/count")(df.agg(
      min(col("o_totalprice")), max(col("o_totalprice")), count(lit(1))).collect())
    // Replicate withBucket inline to time the bucket-assign pass alone.
    val bounds = df.agg(
      percentile_approx(col("o_totalprice"), typedLit(ps), lit(100)).as("__bnds"),
      count(lit(1)).as("__n"))
    val bridge = org.apache.spark.sql.graftbridge.GraftSqlBridge
    val bucketed = df.filter(col("o_totalprice").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("__b", bridge.column(graft.functions.SortedBucket(
        bridge.expression(col("o_totalprice")),
        bridge.expression(col("__bnds")))))
      .drop("__bnds")
    time("bucketed count")(bucketed.count())
    time("bucketed count AGAIN")(bucketed.count())
    time("per-bucket counts")(
      bucketed.groupBy(col("__b"), col("__n")).agg(count(lit(1))).collect())
    val sel = graft.ops.DistributedSelect.atRanks(
      df, "o_totalprice", "o_orderkey",
      n => Seq(ceil(lit(0.25) * n).cast("long"), ceil(lit(0.5) * n).cast("long"),
        ceil(lit(0.75) * n).cast("long")))
    time("full atRanks")(sel.collect())
    time("full atRanks AGAIN")(sel.collect())
    val sel256 = graft.ops.DistributedSelect.atRanks(
      df, "o_totalprice", "o_orderkey",
      n => Seq(ceil(lit(0.25) * n).cast("long"), ceil(lit(0.5) * n).cast("long"),
        ceil(lit(0.75) * n).cast("long")), buckets = 256)
    time("atRanks buckets=256")(sel256.collect())
    time("atRanks buckets=256 AGAIN")(sel256.collect())
    spark.stop()
  }
}
