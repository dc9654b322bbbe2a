package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward nearest-key) join — dask `merge_asof` semantics
  * (SURVEY.md §2.3 [P]), Spark-first design.
  *
  * Spark has no native ASOF JOIN, and a naive implementation
  * (per-left-row range join) is a broadcast-nested-loop — O(n·m) and
  * hopeless at 100 TB. Instead we use the union+window construction:
  * tag both sides, union them, and carry the most recent right-side
  * payload forward with `last(_, ignoreNulls)` over a window
  * partitioned by the equi-key and ordered by time. Cost = ONE shuffle
  * on the key (same as any equi-join) + a per-partition sort — scales
  * exactly like sort-merge join, no matter how skewed the time axis.
  *
  * Inclusive match (left.ts >= right.ts): at equal timestamps the
  * right row is ordered before the left probe via the tag sort key.
  *
  * Ties among right rows at equal (key, ts) are broken deterministically:
  * the window is additionally ordered by the payload columns ascending,
  * so `last(ignoreNulls)` picks the max-payload row — the same row a
  * `ORDER BY ts DESC, payload DESC LIMIT 1` correlated lookup selects.
  * (A plain ASOF JOIN leaves this unspecified in both engines.)
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (payload carried forward)
    * @param key        equi-join key column name (same name both sides)
    * @param ts         event-time column name (same name both sides)
    * @param rightCols  right-side payload columns to attach to each left row
    * @param allowExactMatches  pandas/dask `allow_exact_matches`: false
    *                   makes the match strict (right.ts < left.ts) —
    *                   implemented purely in the tie-break sort (left
    *                   probes order BEFORE right rows at equal ts, so
    *                   the carry hasn't seen them yet); no extra pass.
    * @param toleranceUs  pandas/dask `tolerance`: max left.ts − right.ts
    *                   in microseconds; a carried match older than the
    *                   tolerance is nulled out post-window (the carry
    *                   additionally tracks the matched right ts).
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String], allowExactMatches: Boolean = true,
               toleranceUs: Option[Long] = None): DataFrame =
    merged(left, right, key, ts, rightCols, fwd = false,
      allowExact = allowExactMatches, toleranceUs = toleranceUs)

  /** Forward as-of (dask `merge_asof(direction="forward")`): for each
    * left row, the FIRST right row with right.ts >= left.ts — the exact
    * time-mirror of [[backward]] (ts ordering reversed; ties at equal
    * (key, ts) resolve to the min payload, mirroring backward's max).
    */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
              rightCols: Seq[String], allowExactMatches: Boolean = true,
              toleranceUs: Option[Long] = None): DataFrame =
    merged(left, right, key, ts, rightCols, fwd = true,
      allowExact = allowExactMatches, toleranceUs = toleranceUs)

  private def merged(left: DataFrame, right: DataFrame, key: String, ts: String,
                     rightCols: Seq[String], fwd: Boolean,
                     allowExact: Boolean = true,
                     toleranceUs: Option[Long] = None): DataFrame = {
    require(!rightCols.contains(ts),
      s"rightCols must not contain the as-of ts column '$ts' (it is carried automatically)")
    // "__m_ts" is the carry struct's reserved match-ts field — a payload
    // column of that name would make the struct field ambiguous and
    // silently corrupt the tolerance check; dotted names would parse as
    // nested-field paths in the internal column references.
    require(!rightCols.contains("__m_ts"),
      "rightCols must not contain the reserved name '__m_ts'")
    val leftCols = left.columns.toSeq
    // Left payload columns are resolved via col(c) below exactly like the
    // key/ts/right columns, so the same hazards apply: '.' parses as a
    // nested-field path, and the internal working names (__tag, __c,
    // __r_<payload>) would collide with real columns and corrupt the carry.
    val internal = Set("__tag", "__c") ++ rightCols.map(c => s"__r_$c")
    (rightCols ++ leftCols :+ key :+ ts).foreach { c =>
      require(!c.contains("."),
        s"column name '$c' contains '.' — unsupported in as-of join " +
          "(rename the column first)")
      require(!internal.contains(c),
        s"column name '$c' collides with an as-of join internal column " +
          "(rename the column first)")
    }
    val l = left
      .withColumn("__tag", lit(1))
      .select(leftCols.map(col) ++ rightCols.map(c => lit(null).as(s"__r_$c")) :+ col("__tag"): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == key || c == ts) col(c) else lit(null).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+ col("__tag"): _*)
    // tag asc => right (0) sorts before left (1) at equal ts: inclusive
    // match (allow_exact_matches=false flips the tag order, so the left
    // probe runs before same-ts right rows and never sees them);
    // payload ordering => last() is deterministic under ties.
    // Forward direction = the same scan over reversed time.
    val tsOrd = if (fwd) col(ts).desc else col(ts).asc
    val tagOrd = if (allowExact) col("__tag").asc else col("__tag").desc
    val payOrd = rightCols.map(c =>
      if (fwd) col(s"__r_$c").desc else col(s"__r_$c").asc)
    val w = Window.partitionBy(key)
      .orderBy(tsOrd +: tagOrd +: payOrd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Single-struct carry: the matched ts and ALL payloads ride in one
    // struct behind one last(ignoreNulls), so they always come from the
    // same right row — a right row with a null payload value advances
    // the match (pandas row semantics) instead of desyncing the
    // tolerance timestamp from an older payload. The struct is null for
    // left probes (ignoreNulls skips them) and non-null for every right
    // row, even one whose payload fields are all null.
    val carryFields = col(ts).as("__m_ts") +: rightCols.map(c => col(s"__r_$c").as(c))
    val carried = l.unionByName(r)
      .withColumn("__c",
        last(when(col("__tag") === 0, struct(carryFields: _*)), ignoreNulls = true).over(w))
    val matched = carried.filter(col("__tag") === 1)
    val withinTol = toleranceUs match {
      case None => matched
      case Some(tol) =>
        // |left.ts − matched right ts| must be within the tolerance;
        // outside it the whole match nulls out, matching
        // pandas merge_asof(tolerance=...).
        val delta =
          if (fwd) unix_micros(col("__c").getField("__m_ts")) - unix_micros(col(ts))
          else unix_micros(col(ts)) - unix_micros(col("__c").getField("__m_ts"))
        matched.withColumn("__c", when(delta <= tol, col("__c")))
    }
    withinTol
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__c").getField(c).as(c)): _*)
  }
}
