package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke gate: a PLAIN session (none of our
  * confs) calling SparkEntry.entry — must return rows. Guards against
  * entry() depending on session-level settings only Verify/Bench set.
  */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows: $n  columns: ${df.columns.mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
