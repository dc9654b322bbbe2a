package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reusable per-key ordered-window operators (pandas ewm / rolling /
  * sessionize surface). Each adds ONE result column and leaves the
  * frame otherwise intact, so the graded queries and the StreamFrame
  * veneer share the exact same expressions (identical plans, identical
  * oracle hashes). All are single window passes with per-key state —
  * the shape that scales: one shuffle on the keys, no global sort.
  */
object RollingOps {

  /** ewm(alpha=0.5).mean() with a bounded `lookback` (default 32
    * observations; dropped tail weight 2^-32 ≈ 2e-10 — the
    * state-bounded form a streaming engine keeps). Determinism: every
    * weight is a power of two (x·2^-k is exact — an exponent shift)
    * and the addition tree is explicitly left-associated, so the
    * rounding sequence is bit-identical across engines.
    */
  def ewmMean(df: DataFrame, valueCol: String, keys: Seq[Column],
              order: Seq[Column], out: String = "ewm",
              lookback: Int = 32): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    def lagK(k: Int) = if (k == 0) col(valueCol) else lag(col(valueCol), k).over(w)
    val num = (0 until lookback)
      .map(k => coalesce(lagK(k), lit(0.0)) * lit(math.pow(2.0, -k)))
      .reduceLeft(_ + _)
    val den = (0 until lookback)
      .map(k => when(lagK(k).isNotNull, lit(math.pow(2.0, -k))).otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    df.withColumn(out, num / den)
  }

  /** rolling(n, min_periods=m).median(), exact pandas semantics: sort
    * the explicit ≤n-row frame list and pick/average the middle —
    * element selection plus at most one (a+b)/2, so no
    * quantile-interpolation formula ambiguity.
    *
    * Null handling matches pandas skipna: `collect_list` drops nulls,
    * so the frame holds only non-null observations, and a row emits
    * NULL (pandas NaN) when fewer than `minPeriods` of them are in
    * frame — in particular pandas' default `rolling(n).median()` is
    * `minPeriods = n`, which nulls the first n−1 rows of each key.
    * Oracle pairing note: DuckDB's `list()` KEEPS nulls — an oracle
    * over nullable data must `FILTER (WHERE x IS NOT NULL)` the list
    * aggregate and gate on the same non-null count.
    */
  def rollingMedian(df: DataFrame, valueCol: String, n: Int,
                    keys: Seq[Column], order: Seq[Column],
                    out: String = "roll_median",
                    minPeriods: Int = 1): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn("__arr", sort_array(collect_list(col(valueCol)).over(w)))
      .withColumn("__n", size(col("__arr")))
      .withColumn(out,
        when(col("__n") < minPeriods, lit(null))
          .when(col("__n") % 2 === 1,
            expr("element_at(__arr, cast((__n+1) div 2 as int))"))
          .otherwise((expr("element_at(__arr, cast(__n div 2 as int))")
            + expr("element_at(__arr, cast(__n div 2 + 1 as int))")) / 2.0))
      .drop("__arr", "__n")
  }

  /** rolling(n, min_periods=m).quantile(q, interpolation='linear'),
    * exact pandas semantics: sort the explicit ≤n-row frame, then
    * pos = (cnt−1)·q, lo = ⌊pos⌋, result = a[lo] + (a[lo+1] − a[lo])·
    * (pos − lo). The SAME literal formula must appear in any oracle —
    * built-in continuous-quantile functions (quantile_cont) factor the
    * interpolation differently and can diverge in the last ulp. With
    * q a small dyadic (0.25, 0.5, …) and cnt ≤ n, every intermediate
    * ((cnt−1)·q, the fraction) is an exact double, so both engines run
    * the identical IEEE op sequence. Null handling matches pandas
    * skipna (see [[rollingMedian]]).
    */
  def rollingQuantile(df: DataFrame, valueCol: String, n: Int, q: Double,
                      keys: Seq[Column], order: Seq[Column],
                      out: String = "roll_quantile",
                      minPeriods: Int = 1): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn("__arr", sort_array(collect_list(col(valueCol)).over(w)))
      .withColumn("__n", size(col("__arr")))
      .withColumn("__pos", (col("__n") - 1).cast("double") * lit(q))
      .withColumn("__lo", floor(col("__pos")).cast("int"))
      .withColumn(out,
        when(col("__n") < minPeriods, lit(null))
          .otherwise(
            expr("element_at(__arr, __lo + 1)") +
              (expr("element_at(__arr, least(__lo + 2, __n))")
                - expr("element_at(__arr, __lo + 1)"))
                * (col("__pos") - col("__lo"))))
      .drop("__arr", "__n", "__pos", "__lo")
  }

  /** rolling(window).corr() of the value against its time-order index
    * (rolling Pearson trend). All six window sums are exact (decimal /
    * integer — order-free), cast to double once; zero-variance frames
    * are nulled before sqrt so no NaN can leak.
    */
  def rollingTrendCorr(df: DataFrame, valueCol: String, keys: Seq[Column],
                       order: Seq[Column], window: Int = 10,
                       out: String = "roll_trend"): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(order: _*)
    val w = ord.rowsBetween(-(window - 1), Window.currentRow)
    val xd = col(valueCol).cast(DecimalType(18, 2))
    val rd = col("__rn").cast(DecimalType(10, 0))
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(xd).over(w).cast("double")
    val sy = sum(col("__rn")).over(w).cast("double")
    val sxy = sum(xd * rd).over(w).cast("double")
    val sxx = sum(xd * xd).over(w).cast("double")
    val syy = sum(col("__rn") * col("__rn")).over(w).cast("double")
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    df.withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn(out,
        when(n < 2.0 || varx <= 0.0 || vary <= 0.0, lit(null))
          .otherwise((n * sxy - sx * sy) / (sqrt(varx) * sqrt(vary))))
      .drop("__rn")
  }

  /** Gap-based sessionization: a new session opens after a silence of
    * more than `gapSeconds`; ids are a per-key running sum of boundary
    * flags (1-based, dense in time order). Integer µs arithmetic only.
    */
  def sessionize(df: DataFrame, tsCol: String, gapSeconds: Long,
                 keys: Seq[Column], order: Seq[Column],
                 out: String = "session_id"): DataFrame = {
    val ord = Window.partitionBy(keys: _*).orderBy(order: _*)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ep = unix_micros(col(tsCol))
    df.withColumn("__boundary",
        when(lag(ep, 1).over(ord).isNull
          || ep - lag(ep, 1).over(ord) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn(out, sum(col("__boundary")).over(cum))
      .drop("__boundary")
  }
}
