package graft

import org.apache.spark.sql.functions._
import graft.engine.{GraftFunctions, Tables}

/** The property reservoir sampling cannot give and BottomKSample can:
  * the sample is a pure function of the data, independent of
  * partitioning/merge order.
  */
class BottomKSampleSpec extends SparkSpec {

  test("bottom-k sample is identical under any partitioning") {
    val orders = Tables(spark, sfDir, "orders")
    def sample(n: Int): Seq[Long] = {
      val df = if (n == 0) orders.coalesce(1) else orders.repartition(n)
      df.agg(GraftFunctions.bottomkSample(spark, col("o_orderkey"), 25, 7L).as("s"))
        .head.getSeq[Long](0)
    }
    val ref = sample(0)
    assert(ref.size === 25)
    Seq(2, 7, 32).foreach(n => assert(sample(n) === ref, s"partitioning $n changed sample"))
  }

  test("sample values are real keys and distinct") {
    val orders = Tables(spark, sfDir, "orders")
    val s = orders
      .agg(GraftFunctions.bottomkSample(spark, col("o_orderkey"), 40, 3L).as("s"))
      .head.getSeq[Long](0)
    assert(s.distinct.size === s.size)
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s.forall(keys.contains))
  }

  test("different salts give different samples") {
    val orders = Tables(spark, sfDir, "orders")
    def s(salt: Long) = orders
      .agg(GraftFunctions.bottomkSample(spark, col("o_orderkey"), 25, salt).as("s"))
      .head.getSeq[Long](0).toSet
    assert(s(1L) !== s(2L))
  }
}
