package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftSqlBridge

import graft.functions.{BloomMightContain, LongBloom}

/** Bloom-filter semi-join reduction (the scale story for shuffle joins
  * whose build side is too big to broadcast as a hash relation but
  * whose KEY SET fits a few megabytes of bloom bits).
  *
  * At 100 TB the dominant cost of `fact ⋈ dim(filtered)` is shuffling
  * fact rows that will never match. A blocked bloom over the dim keys
  * — built with one map-side-combined pass (`treeAggregate`, partial
  * filters OR-merged log-depth so the driver never fans in more than
  * `depth` arrays at once) — is broadcast into a codegen'd probe
  * ([[graft.functions.BloomMightContain]]) that drops non-matching
  * fact rows BEFORE the exchange. False positives only cost shuffle
  * bytes; the join after it keeps exact semantics, so any oracle of
  * the plain join is unchanged.
  *
  * This is the manual, composable form of what Spark's runtime
  * row-level filtering injects for eligible shapes; owning the
  * operator lets it serve shapes the optimizer rule won't touch
  * (pre-aggregated build sides, typed pipelines, streams).
  */
object BloomPrefilter {

  /** Build a blocked bloom of `dim`'s integral key column in one
    * distributed pass. `expectedItems` sizes the filter (callers that
    * know table statistics — e.g. the RangeLayout sidecar — pass them;
    * the count is NOT taken here to keep plan construction lazy).
    */
  def buildBloom(dim: DataFrame, key: String, expectedItems: Long,
                 fpp: Double = 0.01): (Array[Long], Int) = {
    val (words, k) = LongBloom.provision(expectedItems, fpp)
    val keys = dim.select(col(key).cast("long")).na.drop()
    val bits = keys.queryExecution.toRdd
      .mapPartitions { it =>
        // one partial filter per partition: map-side combine for blooms
        val local = new Array[Long](words)
        it.foreach(r => LongBloom.insert(local, k, r.getLong(0)))
        Iterator.single(local)
      }
      .treeReduce(LongBloom.merge, depth = 2)
    (bits, k)
  }

  /** `fact` with rows whose `key` cannot be in the bloom removed —
    * an exact superset of the join-surviving rows, codegen probe, no
    * shuffle. Place the real join after it.
    */
  def prefilter(fact: DataFrame, key: String, bits: Array[Long], k: Int): DataFrame =
    fact.where(GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(col(key)), bits, k)))

  /** Convenience: build on `dim(dimKey)`, probe on `fact(factKey)`. */
  def semiReduce(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val (bits, k) = buildBloom(dim, dimKey, expectedItems, fpp)
    prefilter(fact, factKey, bits, k)
  }
}
