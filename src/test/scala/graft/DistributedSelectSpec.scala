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

  test("atRanks survives a 30%-multiplicity hot value (skew armor)") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(99)
    // 30% zeros + continuous tail: the zero-run spans many requested
    // ranks and would previously sort its whole bucket in one window
    // task; the (value, count) collapse makes it one row.
    val values = Seq.fill(3000)(0.0) ++ Seq.fill(7000)(rng.nextDouble() * 100)
    val shuffled = rng.shuffle(values)
    val df = shuffled.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "k")
    val sortedRef = shuffled.sorted
    val ranks = Seq(1, 500, 2500, 3000, 3001, 5000, 9999, 10000)
    val got = DistributedSelect.atRanks(df, "v", "k",
        _ => ranks.map(r => lit(r.toLong)), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.foreach { r =>
      assert(got(r.toLong) === sortedRef(r - 1), s"rank $r wrong under skew")
    }
    // labels must still resolve (the median-query path) with several
    // ranks landing inside the hot run
    val labeled = DistributedSelect.atRanks(df, "v", "k",
        _ => Seq(lit(500L), lit(2500L)), buckets = 16,
        labelsOfN = Some(_ => Seq((lit(500L), lit("lo")), (lit(2500L), lit("hi")))))
      .collect().map(r => r.getString(2) -> r.getDouble(1)).toMap
    assert(labeled("lo") === 0.0 && labeled("hi") === 0.0)
  }

  test("atRanks widens int/float/decimal/date columns order-preservingly") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(5)
    val ints = Seq.fill(500)(rng.nextInt(1000) - 500)
    val intDf = ints.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "k")
    val gotInt = DistributedSelect.atRanks(intDf, "v", "k",
        _ => Seq(lit(1L), lit(250L), lit(500L)), buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sortedInts = ints.sorted
    assert(gotInt(1L) === sortedInts(0) && gotInt(250L) === sortedInts(249) &&
      gotInt(500L) === sortedInts(499))
    val decDf = intDf.select(
      (col("v").cast("decimal(12,2)") / 4).cast("decimal(12,2)").as("v"), col("k"))
    val decRef = decDf.select("v").collect().map(_.getDecimal(0)).sorted
    val gotDec = DistributedSelect.atRanks(decDf, "v", "k",
        _ => Seq(lit(100L), lit(400L)), buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(gotDec(100L) === decRef(99) && gotDec(400L) === decRef(399))
    val dateDf = intDf.select(date_add(lit("2020-01-01").cast("date"),
      col("v") + 500).as("v"), col("k"))
    val dateRef = dateDf.select("v").collect().map(_.getDate(0)).sortBy(_.getTime)
    val gotDate = DistributedSelect.atRanks(dateDf, "v", "k",
        _ => Seq(lit(42L)), buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getDate(1)).toMap
    assert(gotDate(42L) === dateRef(41))
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
