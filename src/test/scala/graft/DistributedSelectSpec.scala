package graft

import org.apache.spark.sql.functions._
import graft.ops.DistributedSelect

/** Model-check of the distributed order-statistic machinery that
  * quartiles / median / describe_quantiles / qcut / winsorize all
  * reuse: `atRanks` must agree with the naive "collect, sort, index"
  * reference on adversarial inputs — heavy ties, skewed distributions,
  * tiny inputs, rank = 1 and rank = n edges — and
  * `withRangeRowNumber` must be a bijection onto 1..n that orders
  * exactly like the sort key.
  */
class DistributedSelectSpec extends SparkSpec {

  private def check(values: Seq[Double], ranks: Seq[Int]): Unit = {
    val spark2 = spark
    import spark2.implicits._
    val df = values.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "k")
    val sortedRef = values.zipWithIndex
      .map { case (v, i) => (v, i.toLong) }
      .sortBy(identity)
    val got = DistributedSelect.atRanks(df, "v", "k",
        _ => ranks.map(r => lit(r.toLong)), buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.foreach { r =>
      assert(got.contains(r.toLong), s"rank $r missing (n=${values.size})")
      assert(got(r.toLong) === sortedRef(r - 1)._1,
        s"rank $r: got ${got(r.toLong)}, want ${sortedRef(r - 1)._1}")
    }
  }

  test("atRanks matches the sorted reference on adversarial shapes") {
    val rng = new scala.util.Random(42)
    // heavy ties
    check(Seq.fill(50)(rng.nextInt(3).toDouble), Seq(1, 13, 25, 38, 50))
    // skewed continuous
    check(Seq.fill(200)(math.pow(rng.nextDouble(), 8) * 1e6),
      Seq(1, 2, 50, 100, 150, 199, 200))
    // all-equal column
    check(Seq.fill(30)(7.0), Seq(1, 15, 30))
    // tiny inputs
    check(Seq(3.0, 1.0), Seq(1, 2))
    check(Seq(5.0), Seq(1))
    // negative + duplicates across bucket boundaries
    check(Seq.tabulate(100)(i => ((i % 10) - 5).toDouble), Seq(1, 10, 55, 91, 100))
  }

  test("withRangeRowNumber is a bijection onto 1..n ordered by the key") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(7)
    val data = Seq.fill(500)((rng.nextInt(50).toDouble, rng.nextLong()))
    val df = data.toDF("v", "k")
    val rows = DistributedSelect.withRangeRowNumber(
        df, Seq(col("v"), col("k")), numParts = 8)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq === (1L to 500L), "not a bijection")
    val bySort = data.sorted
    rows.sortBy(_._3).zip(bySort).foreach { case ((v, k, rn), (ev, ek)) =>
      assert(v === ev && k === ek, s"row number $rn out of order")
    }
  }
}
