package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col

/** dask `map_overlap` for keyed, time-ordered data — run an arbitrary
  * function over each row's trailing window of `overlap` predecessors
  * (SURVEY.md §2.5 [P]: pandas `.rolling(n).apply(fn)` / dask
  * `map_overlap(fn, before=n)`).
  *
  * dask materializes halo rows by copying partition edges; the
  * Spark-native reading is `flatMapSortedGroups`: ONE key shuffle, rows
  * of each key streamed to the function in sort order, and the halo is
  * just a bounded ring buffer the iterator carries — constant memory
  * per key regardless of group size, no edge-row duplication, no
  * second pass. Declarative window frames stay the first choice for
  * aggregable functions (see `window_rolling`); this is the escape
  * hatch for genuinely imperative per-window logic.
  */
object MapOverlap {

  /** Apply `fn(currentRow, trailingWindow)` per row, where
    * `trailingWindow` holds the row itself and up to `overlap`
    * predecessors of the same key in ascending `ordCols` order.
    *
    * @param keyCol  grouping key column, LongType (one shuffle on it)
    * @param ordCols total per-key order (ties must be broken for
    *                deterministic output)
    * @param fn      (row, window incl. row, oldest→newest) → result
    */
  def trailing[T](df: DataFrame, keyCol: String, ordCols: Seq[String],
                  overlap: Int)(fn: (Row, Seq[Row]) => T)
                 (implicit enc: Encoder[T]): DataFrame = {
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.as[Row]
      .groupByKey(r => r.getLong(keyIdx))
      .flatMapSortedGroups(ordCols.map(col(_).asc): _*) { (_, rows) =>
        val halo = scala.collection.mutable.ArrayDeque.empty[Row]
        rows.map { r =>
          halo.append(r)
          if (halo.size > overlap + 1) halo.removeHead()
          fn(r, halo.toSeq)
        }
      }
      .toDF()
  }
}
