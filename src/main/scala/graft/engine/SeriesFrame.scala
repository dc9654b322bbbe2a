package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-column veneer — the reference's `StreamingSeries` idiom
  * (`sdf["x"].sum()`, SURVEY.md §1 [P]) over a Spark column.
  *
  * A series is just (DataFrame, column name): transformations project
  * the column (Catalyst prunes the scan to it — a 2-column read never
  * touches the other 40), terminal aggregates return a 1-row DataFrame
  * named `<col>_<op>`. Everything stays declarative, so a series chain
  * compiles to the same pushed-down/codegen plan the DataFrame API gets.
  */
final class SeriesFrame(val df: DataFrame, val name: String) {
  private def c: Column = col(name)
  private def map1(f: Column => Column): SeriesFrame =
    new SeriesFrame(df.select(f(c).as(name)), name)
  private def agg1(f: Column => Column, op: String): DataFrame =
    df.agg(f(c).as(s"${name}_$op"))

  // ---- transformations (lazy, return a new series)
  def rename(n: String): SeriesFrame = new SeriesFrame(df.select(c.as(n)), n)
  def astype(t: String): SeriesFrame = map1(_.cast(t))
  def abs: SeriesFrame = map1(org.apache.spark.sql.functions.abs)
  def +(x: Double): SeriesFrame = map1(_ + x)
  def -(x: Double): SeriesFrame = map1(_ - x)
  def *(x: Double): SeriesFrame = map1(_ * x)
  def /(x: Double): SeriesFrame = map1(_ / x)
  def fillna(v: Any): SeriesFrame =
    new SeriesFrame(df.na.fill(Map(name -> v)), name)
  def dropna(): SeriesFrame = new SeriesFrame(df.na.drop(Seq(name)), name)
  def isin(vals: Any*): SeriesFrame = map1(_.isin(vals: _*))

  // ---- terminal aggregates (1-row frame, column `<name>_<op>`)
  def sum(): DataFrame = agg1(org.apache.spark.sql.functions.sum, "sum")
  def mean(): DataFrame = agg1(avg, "mean")
  def min(): DataFrame = agg1(org.apache.spark.sql.functions.min, "min")
  def max(): DataFrame = agg1(org.apache.spark.sql.functions.max, "max")
  def count(): DataFrame = agg1(org.apache.spark.sql.functions.count, "count")
  def nunique(): DataFrame = agg1(countDistinct(_), "nunique")

  /** pandas value_counts: descending frequency, value tie-break. */
  def valueCounts(): DataFrame =
    df.groupBy(c).agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .orderBy(col("n").desc, c)

  def toDF(): DataFrame = df.select(c)
}
