package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** High-cardinality groupBy control — the dask `split_out`/`split_every`
  * analogue (SURVEY.md §2.4 [P]).
  *
  * Spark's default groupBy plan is partial-aggregate → shuffle → final:
  * ideal when groups ≪ rows (map-side combine collapses the shuffle),
  * PESSIMAL when groups ≈ rows — every task builds a pre-shuffle hash
  * table that combines nothing, then ships it anyway. `split_out`
  * semantics: explicitly cluster rows by key into `splitOut` output
  * partitions first; Catalyst sees the required distribution satisfied
  * and adds NO second exchange — the partial/final pair runs
  * back-to-back in one stage, so nothing uncombined crosses the
  * network. `splitOut` also pins the output partition count, bounding
  * per-partition group state so a billion-group aggregate fits executor
  * memory at 100 TB (dask's reason for the knob).
  */
object HighCardAgg {

  def groupAgg(df: DataFrame, splitOut: Int, keys: Seq[String],
               aggs: Seq[Column]): DataFrame =
    df.repartition(splitOut, keys.map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Tree-reduce for WIDE per-group state — the dask `split_every`
    * analogue. A one-level `collect_set` builds each group's ENTIRE
    * distinct set inside single partial-aggregate hash tables (and, for
    * a hot key, one final task); here level 1 groups by
    * (keys, hash(value) % splitEvery) so every partial state holds
    * ~1/splitEvery of the group's distinct values, and level 2 merges
    * the ≤ splitEvery partials per group. Salting by the VALUE hash
    * (not a random salt) keeps the level-1 sets disjoint, so the merge
    * is a plain flatten — and both levels stay deterministic.
    *
    * @return keys + `<valueCol>_set`: the group's distinct values,
    *         ascending (array column).
    */
  def collectDistinctTree(df: DataFrame, keys: Seq[String], valueCol: String,
                          splitEvery: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.{array_distinct, array_sort, collect_list, collect_set, flatten, lit, pmod, xxhash64}
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(splitEvery)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(collect_set(col(valueCol)).as("__part"))
    partial.groupBy(keys.map(col): _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("__part")))))
        .as(s"${valueCol}_set"))
  }
}
