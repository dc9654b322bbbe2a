package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** TTL-chain deduplication — the batch-deterministic analogue of
  * Structured Streaming's `dropDuplicatesWithinWatermark` state
  * machine: the FIRST event of a key opens a suppression window of
  * `ttlMs`; every same-key event inside it is dropped; the first event
  * at or past the window's end is kept and opens the next window.
  * (Unlike a lag-gap filter, suppression is anchored to the previously
  * KEPT event — the chain — which is exactly how the streaming state
  * store expires dedup entries.)
  *
  * Scale shape: one hash shuffle on the key columns, an in-partition
  * sort (key, ts, tie-break), then a single forward scan carrying O(1)
  * state per task (current key + last kept timestamp). No per-group
  * buffering, no window function, no iterative jobs — the same cost
  * envelope as any keyed aggregation at 100 TB. This is the
  * `mapPartitions`-as-last-resort case (SURVEY.md §2 preference (d)):
  * the chain recurrence is not expressible with relational window
  * functions (each decision depends on the previous DECISION, not the
  * previous row).
  */
object ChainDedup {

  /** Rows that survive TTL-chain dedup, original schema preserved.
    *
    * @param df          input; must contain `keys`, `tsMillisCol` (LongType
    *                    epoch millis) and `tieBreakCol`
    * @param keys        dedup key columns
    * @param tsMillisCol event-time column in epoch milliseconds
    * @param ttlMs       suppression window length
    * @param tieBreakCol total-order tie-break within equal timestamps
    */
  def keepFirstPerTtl(df: DataFrame, keys: Seq[String], tsMillisCol: String,
                      ttlMs: Long, tieBreakCol: String): DataFrame = {
    require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")
    val ordered = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(
        (keys.map(col) :+ col(tsMillisCol) :+ col(tieBreakCol)): _*)
    val schema = ordered.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val tsIdx = schema.fieldIndex(tsMillisCol)
    ordered.mapPartitions { it =>
      // keys are contiguous after the partition-local sort, so one
      // (key, lastKept) pair of state suffices for the whole task.
      var curKey: IndexedSeq[Any] = null
      var lastKept = Long.MinValue
      it.filter { row =>
        val k: IndexedSeq[Any] = keyIdx.map(row.get).toIndexedSeq
        val ts = row.getLong(tsIdx)
        if (curKey == null || k != curKey) {
          curKey = k; lastKept = ts; true
        } else if (ts >= lastKept + ttlMs) {
          lastKept = ts; true
        } else false
      }
    }(Encoders.row(schema))
  }
}
