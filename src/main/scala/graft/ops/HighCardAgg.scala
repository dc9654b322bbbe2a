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
}
