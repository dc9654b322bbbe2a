package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement-honesty audit for the count()-based bench: Catalyst may
  * legally DELETE whole branches under `df.count()` — e.g. a left
  * outer join whose right side is provably unique on the join key and
  * contributes no surviving columns (the incremental-dedup tail shape)
  * — so a count-based timing can measure a plan that never runs the
  * operator being graded. For every registry key this probe compares
  * the leaf scans of the query's own optimized plan against the
  * optimized plan of `count()` over it and flags every key where
  * count() dropped a leaf. Bench and ShuffleAudit run the same probe
  * per key at runtime and switch flagged keys to full materialization
  * (`toRdd.count()`); this tool is the standalone whole-board sweep.
  *
  * Usage: CountPlanProbe [sfDir] [singleKey]
  */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = only.map(k => Seq(graft.queries.Registry.byKey(k)))
      .getOrElse(graft.queries.Registry.all)
    var flagged = List.empty[String]
    keys.foreach { q =>
      try {
        val df = q.build(spark, dir)
        def leaves(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
          p.collectLeaves().size
        val own = leaves(df.queryExecution.optimizedPlan)
        val cnt = leaves(df.groupBy().count().queryExecution.optimizedPlan)
        if (cnt < own) {
          flagged ::= q.key
          println(s"FLAG ${q.key}: df has $own leaf scans, count() has $cnt")
        }
      } catch {
        case e: Throwable => println(s"ERR ${q.key}: ${e.getClass.getSimpleName}")
      }
    }
    println(s"flagged: ${flagged.sorted.mkString(", ")}")
    spark.stop()
  }
}
