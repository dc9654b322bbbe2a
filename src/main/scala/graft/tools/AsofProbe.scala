package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label (rows=$n, iter $i)")
      }
    }
    time("join_asof")(Registry.byKey("join_asof").build(spark, dir).count())
    time("join_asof_forward")(Registry.byKey("join_asof_forward").build(spark, dir).count())
    time("join_asof_native")(Registry.byKey("join_asof_native").build(spark, dir).count())
    time("join_asof_nearest")(Registry.byKey("join_asof_nearest").build(spark, dir).count())
    val df = Registry.byKey("join_asof_nearest").build(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
