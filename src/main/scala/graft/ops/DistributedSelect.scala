package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-statistic selection (exact median / quantiles by
  * rank) without a single-task global sort.
  *
  * The naive construction — `row_number().over(Window.orderBy(v))` —
  * funnels EVERY row through one task: a scale-killer at 100 TB. This
  * is the classic distributed-selection shape instead, all in ONE
  * declarative plan (no driver-side actions):
  *
  *  1. bucket boundaries from `approx_percentile` (a mergeable sketch —
  *     one distributed agg), broadcast to every row;
  *  2. per-bucket counts (distributed hash agg, ≤ `buckets` rows) →
  *     cumulative offsets + total n via a window over that TINY frame;
  *  3. rows join (broadcast) their bucket's [offset, offset+count]
  *     range; only buckets containing a requested rank survive the
  *     filter — ~n/buckets rows instead of n;
  *  4. a per-bucket sort window assigns local row numbers; global rank
  *     = bucket offset + local rank. Select the requested ranks.
  *
  * Selection BY VALUE is robust to boundary placement: rows with equal
  * v are contiguous within a bucket regardless of tie-breaks, so the
  * value at any global rank is exactly the value of the true sorted
  * order even if equal keys straddle a boundary.
  */
object DistributedSelect {

  /** Bucket assignment as a codegen'd BINARY SEARCH over the broadcast
    * boundary array ([[graft.functions.SortedBucket]]). Two earlier
    * formulations were measured and replaced:
    *
    *  - `aggregate()` HOF (count of boundaries below v): interpreted,
    *    not codegen'd — ~6–12 µs/row, 90+ s for one pass over 15 M
    *    rows at ×100 scale;
    *  - broadcast RANGE JOIN against ≤ buckets+1 exploded (lo, hi]
    *    ranges: codegen'd predicates but still a nested-loop probe of
    *    ~buckets ranges per row through join machinery — the dominant
    *    ~25 s of the 29 s quartiles run at ×1000 scale (150 M rows).
    *
    * The binary search keeps the same contract: bucket id =
    * #{k: bnds[k] < v} (a value EQUAL to a boundary lands left of it,
    * so equal values can never straddle buckets), comparisons in v's
    * own physical type, O(log buckets) per row inside whole-stage
    * codegen, and the bounds stay a regular runtime input (broadcast
    * one-row crossJoin) — still ONE declarative plan, no driver
    * actions. Rows with NULL v are dropped (order statistics over
    * nulls are undefined; callers filter first).
    */
  /** [[graft.functions.SortedBucket]]'s kernels compare in double or
    * long only; [[percentile_approx]] is numeric-only. Widen any other
    * orderable column with an ORDER-PRESERVING map (monotone, so bucket
    * ranges stay contiguous in v's own order; ties the widening
    * introduces land in one bucket and the local sort — still on the
    * ORIGINAL v — resolves them): integrals exactly to long, dates to
    * their epoch-day long, float/decimal monotonically to double.
    * Returns None when v is already a kernel type. The SKETCH and the
    * bucket assignment must use the same widening — both call here. */
  private def widenExpr(dt: org.apache.spark.sql.types.DataType,
                        v: Column): Option[(Column, String)] = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | LongType => None
      case ByteType | ShortType | IntegerType => Some((v.cast("long"), "bigint"))
      case DateType => Some((unix_date(v).cast("long"), "bigint"))
      case FloatType | _: DecimalType => Some((v.cast("double"), "double"))
      case other => throw new IllegalArgumentException(
        s"order-statistic selection over unsupported type $other " +
          "(orderable numerics and dates only)")
    }
  }

  /** The widened sketch input for v (identity when already wide). */
  private def sketchCol(df: DataFrame, v: Column): Column =
    widenExpr(df.select(v).schema.head.dataType, v).map(_._1).getOrElse(v)

  private def withBucket(df: DataFrame, v: Column, bounds: DataFrame,
                         bndsCol: String = "__bnds"): DataFrame = {
    val (vc, bc) = widenExpr(df.select(v).schema.head.dataType, v) match {
      case None => (v, col(bndsCol))
      case Some((w, t)) => (w, col(bndsCol).cast(s"array<$t>"))
    }
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("__b", org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
        graft.functions.SortedBucket(
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(vc),
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(bc))))
      .drop(bndsCol)
  }

  /** `df` + a 1-based global row number by ORDER BY (v, key) + the total
    * count — with EVERY bucket numbered by a parallel per-bucket window
    * (rn = bucket offset + local row number), never a single-task global
    * sort. Bucket id is a pure function of v, so equal values can never
    * straddle a boundary and the concatenated order is exactly the
    * total (v, key) order. Skew caveat: numbering EVERY row means a
    * value with huge multiplicity keeps its whole bucket in one window
    * task (a pure function of v cannot split a hot value). For
    * skew-prone inputs use [[withRangeRowNumber]], whose range
    * partitioner samples (v, key) JOINTLY and spreads a hot v across
    * partitions by key; selection-by-rank callers are immune —
    * [[atRanks]] collapses equal values to (value, count) before its
    * local sort, so hot values cost one row there.
    *
    * @return original columns + `rnCol` (LongType) + `nCol` (total rows)
    */
  def withGlobalRowNumber(df: DataFrame, vCol: String, keyCol: String,
                          buckets: Int = 256, rnCol: String = "rn",
                          nCol: String = "n_total"): DataFrame = {
    val v = col(vCol)
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df.agg(
      // accuracy 100: boundaries only need to SPLIT the data roughly
      // evenly across `buckets` — correctness never depends on where
      // they land (bucket id is a pure function of v). The real scale
      // lever is `buckets` itself (default 256, was 32): only buckets
      // containing a requested rank pay the final sort, and at 150 M
      // rows the 3 surviving 1/32-buckets sorted on 3 of 32 cores
      // dominated the whole run (measured 24 s; 1/256-buckets: 2.5 s).
      percentile_approx(sketchCol(df, v), typedLit(ps), lit(100)).as("__bnds"),
      count(lit(1)).as(nCol))
    val bucketed = withBucket(df, v, bounds)
    val wcum = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offs = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wcum), lit(0L)))
      .select(col("__b"), col("__off"))
    val wloc = Window.partitionBy(col("__b")).orderBy(v, col(keyCol))
    bucketed.join(broadcast(offs), "__b")
      .withColumn(rnCol, col("__off") + row_number().over(wloc))
      .drop("__b", "__off")
  }

  /** `df` + a 1-based global row number by ORDER BY (orderCols…) for ANY
    * orderable column types — strings included, which the
    * percentile-bucket variant above cannot handle (`percentile_approx`
    * is numeric-only). Same no-funnel shape, different bucketing:
    *
    *  1. `repartitionByRange(numParts, orderCols…)` — sampled range
    *     boundaries, each partition holds a disjoint ordered slice;
    *  2. per-partition counts → cumulative offsets via a window over
    *     ≤ `numParts` rows (the one no-partition window, tiny frame);
    *  3. offsets broadcast back; global rn = offset + per-partition
    *     `row_number` (parallel windows keyed by partition id).
    *
    * The range exchange appears in two subplans (counts + data); they
    * are byte-identical, so Spark's ReuseExchange executes the shuffle
    * once — both sides observe the SAME boundaries and the offsets
    * always match the partition sizes. Determinism does not depend on
    * boundary placement: for a tie-free order the concatenated
    * per-partition orders are exactly the total order wherever the cut
    * points land.
    */
  def withRangeRowNumber(df: DataFrame, orderCols: Seq[Column],
                         numParts: Int = 32, rnCol: String = "rn"): DataFrame = {
    val parted = df.repartitionByRange(numParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wcum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offs = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wcum), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wloc = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    parted.join(broadcast(offs), "__pid")
      .withColumn(rnCol, col("__off") + row_number().over(wloc))
      .drop("__pid", "__off")
  }

  /** Rows of `df` at the given 1-based global ranks of ORDER BY (v, key).
    *
    * @param ranksOfN  builds the wanted rank expressions from the total
    *                  row count column `n` (LongType); e.g.
    *                  `n => Seq(floor((n + 1) / 2))` for the lower median.
    * @param labelsOfN optional (rankExpr -> label) pairs; each selected
    *                  row gets the FIRST label whose rank matches (the
    *                  CASE-precedence an oracle's rank→name mapping uses).
    * @return one row per matched rank: columns `rank`, `v` (+ `label`).
    */
  def atRanks(df: DataFrame, vCol: String, keyCol: String,
              ranksOfN: Column => Seq[Column], buckets: Int = 256,
              labelsOfN: Option[Column => Seq[(Column, Column)]] = None): DataFrame = {
    val v = col(vCol)
    // 1. boundary sketch (31 inner cut points for 32 buckets) + total n
    //    in the SAME distributed agg — one pass, one broadcast.
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df.agg(
      // accuracy 100: boundaries only need to SPLIT the data roughly
      // evenly across `buckets` — correctness never depends on where
      // they land (bucket id is a pure function of v). The real scale
      // lever is `buckets` itself (default 256, was 32): only buckets
      // containing a requested rank pay the final sort, and at 150 M
      // rows the 3 surviving 1/32-buckets sorted on 3 of 32 cores
      // dominated the whole run (measured 24 s; 1/256-buckets: 2.5 s).
      percentile_approx(sketchCol(df, v), typedLit(ps), lit(100)).as("__bnds"),
      count(lit(1)).as("__n"))
    // 2. assign each row its bucket: count of boundaries strictly below
    //    v, via the codegen'd broadcast range join (see withBucket).
    val bucketed = withBucket(
      df.select(v.as("__v"), col(keyCol).as("__k")), col("__v"), bounds)
    // 3. per-bucket counts → offsets (window over ≤ `buckets` rows).
    val wcum = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val info = bucketed.groupBy(col("__b"), col("__n")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wcum), lit(0L)))
    val ranks = ranksOfN(col("__n"))
    val wanted = array_distinct(array(ranks: _*))
    val hit = info
      .withColumn("__want", filter(wanted,
        r => r > col("__off") && r <= col("__off") + col("__c")))
      .filter(size(col("__want")) > 0)
      .select(col("__b"), col("__off"), col("__want"), col("__n"))
    // 4. surviving buckets collapse to (value, count) BEFORE the local
    //    sort: ranks within a run of equal values all select that value,
    //    so the per-bucket window touches DISTINCT values only. This is
    //    the skew armor — a degenerate column (e.g. 30% zeros) makes one
    //    bucket arbitrarily large (bucket id is a pure function of v and
    //    cannot split a hot value), but the collapse turns the hot value
    //    into ONE row through a map-side-combined hash agg, so no
    //    single-task sort re-appears at any multiplicity. A wanted rank
    //    r selects the distinct value whose cumulative-count range
    //    [lo, hi] contains r; several ranks may land in one run.
    val wloc = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val selected = bucketed.drop("__n").join(broadcast(hit), "__b")
      .groupBy(col("__b"), col("__off"), col("__want"), col("__n"), col("__v"))
      .agg(count(lit(1)).as("__cv"))
      .withColumn("__hi", col("__off") + sum(col("__cv")).over(
        wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", col("__hi") - col("__cv") + 1)
      .withColumn("__rank", explode(filter(col("__want"),
        r => r >= col("__lo") && r <= col("__hi"))))
    labelsOfN match {
      case None => selected.select(col("__rank").as("rank"), col("__v").as("v"))
      case Some(mk) =>
        val label = mk(col("__n")).foldRight(lit(null).cast("string")) {
          case ((r, l), acc) => when(col("__rank") === r, l).otherwise(acc)
        }
        selected.select(col("__rank").as("rank"), col("__v").as("v"),
          label.as("label"))
    }
  }
}
