package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** dask-style custom Aggregation (chunk/agg/finalize) re-expressed as a
  * typed Spark `Aggregator` (SURVEY.md §2.10): quantity-weighted mean
  * price. The buffer holds exact decimals (scale 2, HALF_UP — the same
  * rounding Spark's own double→decimal cast uses) so partial/final
  * merge order cannot change the result; `finish` is a single IEEE
  * double division, matching the DuckDB oracle
  * `CAST(SUM(DECIMAL..) AS DOUBLE) / CAST(SUM(DECIMAL..) AS DOUBLE)`.
  */
object WeightedMean extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def dec2(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) =
    (b._1.add(dec2(a._1 * a._2)), b._2.add(dec2(a._2)))

  override def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
      .asInstanceOf[Encoder[(JBigDecimal, JBigDecimal)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted mean of `value` weighted by `weight`. */
  def udafCol(value: Column, weight: Column): Column =
    udaf(this).apply(value, weight)
}
