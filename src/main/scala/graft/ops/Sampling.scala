package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / splitting surface (reference: `.sample`, `train_test_split`,
  * reservoir exact-n — SURVEY.md §2.2/§2.10).
  *
  * Two regimes:
  * - `randomSplit`/`sample(fraction, seed)`: Spark's per-partition
  *   Bernoulli/Poisson sampling — fast and stable for a FIXED
  *   partitioning, but engine-specific (no SQL oracle).
  * - [[hashSample]]: content-hash ordering gives an exact-n sample that
  *   is a pure function of the DATA — independent of partitioning,
  *   cluster size, or engine version. This is the variant a 100 TB
  *   pipeline wants for reproducible training subsets: re-running on a
  *   re-sharded copy of the corpus picks the same rows.
  */
object Sampling {

  /** reference train_test_split(df, test_size, seed). */
  def trainTestSplit(df: DataFrame, testFraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1.0 - testFraction, testFraction), seed)
    (train, test)
  }

  /** Deterministic exact-n sample: order by xxhash64(key, salt), take n.
    * One TakeOrderedAndProject — no full sort materialization.
    */
  def hashSample(df: DataFrame, n: Int, salt: Long, keyCols: Column*): DataFrame =
    df.orderBy(xxhash64(lit(salt) +: keyCols: _*).asc +: keyCols.map(_.asc): _*)
      .limit(n)

  /** Deterministic hash split: stable train/test assignment per row key
    * (the standard way to split a corpus that keeps growing — rows never
    * migrate between splits as data is appended).
    */
  def hashSplit(df: DataFrame, testPermille: Int, salt: Long, keyCols: Column*): DataFrame =
    df.withColumn("split",
      when(pmod(xxhash64(lit(salt) +: keyCols: _*), lit(1000)) < testPermille, lit("test"))
        .otherwise(lit("train")))
}
