package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables

/** §2.5 window / ordered analytics. All windows partition by a key, so
  * at scale each state fits one task; rolling/cum sums go through
  * exact decimals for order-free hash-matching. `top_k` compiles to
  * TakeOrderedAndProjectExec — per-partition heaps + driver merge, the
  * same algorithm dask uses for nlargest.
  */
object WindowQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    // Top-3 suppliers by acctbal within each nation (rank keeps ties).
    GQuery("window_rank",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc)
        Tables(s, dir, "supplier")
          .withColumn("rnk", rank().over(w))
          .filter($"rnk" <= 3)
          .select($"s_nationkey", $"rnk".cast("long").as("rnk"), $"s_suppkey", $"s_acctbal")
          .orderBy($"s_nationkey", $"rnk", $"s_suppkey")
      },
      Some("""SELECT s_nationkey, rnk, s_suppkey, s_acctbal FROM (
                SELECT s_nationkey, s_suppkey, s_acctbal,
                  RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk
                FROM supplier) t
              WHERE rnk <= 3
              ORDER BY s_nationkey, rnk, s_suppkey""")),

    GQuery("window_lag_lead",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id",
            row_number().over(w).cast("long").as("rn"),
            lag($"event_id", 1).over(w).as("prev_id"),
            lead($"event_id", 1).over(w).as("next_id"))
          .orderBy($"user_id", $"rn")
      },
      Some("""SELECT user_id, event_id,
                ROW_NUMBER() OVER w AS rn,
                LAG(event_id, 1) OVER w AS prev_id,
                LEAD(event_id, 1) OVER w AS next_id
              FROM events WHERE user_id < 20
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, rn""")),

    // Rolling 3-row sum of value per user (dask .rolling via map_overlap).
    GQuery("window_rolling",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(-2, Window.currentRow)
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id",
            sum($"value".cast(DecimalType(18, 2))).over(w).cast("double").as("roll_sum"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum
              FROM events WHERE user_id < 20
              ORDER BY user_id, event_id""")),

    // Cumulative per-key sum = pandas-streaming groupby_streaming("cum").
    GQuery("window_cum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id",
            sum($"value".cast(DecimalType(18, 2))).over(w).cast("double").as("cum_value"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
              FROM events WHERE user_id < 20
              ORDER BY user_id, event_id""")),

    // Time-based rolling window: last-hour sum per user (RANGE frame on
    // epoch seconds — pandas rolling("1h")).
    GQuery("window_range",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"epoch_s")
          .rangeBetween(-3600L, 0L)
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .withColumn("epoch_s", unix_timestamp($"ts"))
          .select($"user_id", $"event_id", $"epoch_s",
            sum($"value".cast(DecimalType(18, 2))).over(w).cast("double").as("hour_sum"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
              FROM events WHERE user_id < 20
              ORDER BY user_id, event_id""")),

    // ntile + percent_rank: quantile bucketing / relative ranking.
    // percent_rank = (rank-1)/(n-1) is an exact int ratio → the double
    // is bit-identical in both engines.
    // SCALE BOUND (explicit, not incidental): a no-partition window
    // funnels its input through one task, so this op is only offered
    // over small/pre-filtered frames — here hard-bounded by the
    // o_orderkey < 2000 pushdown filter (≤2k rows at any sf). Unbounded
    // global quantile assignment is what ops/DistributedSelect's
    // range-bucket construction is for (see `median`/`quartiles`).
    GQuery("window_ntile",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"o_totalprice", $"o_orderkey")
        Tables(s, dir, "orders")
          .filter($"o_orderkey" < 2000)
          .select($"o_orderkey",
            ntile(4).over(w).cast("long").as("quartile_bucket"),
            percent_rank().over(w).as("pct_rank"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
                NTILE(4) OVER w AS quartile_bucket,
                PERCENT_RANK() OVER w AS pct_rank
              FROM orders WHERE o_orderkey < 2000
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")),

    // pandas groupby().first()/.last() by event time: first/last value
    // per key over the full ordered frame (both window functions over
    // ONE key shuffle; deterministic via the event_id tie-break).
    GQuery("window_first_last",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "events")
          .select($"user_id",
            first($"event_id").over(w).as("first_event"),
            last($"event_id").over(w).as("last_event"))
          .distinct()
          .orderBy($"user_id")
      },
      Some("""SELECT DISTINCT user_id,
                FIRST_VALUE(event_id) OVER w AS first_event,
                LAST_VALUE(event_id) OVER w AS last_event
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY user_id""")),

    // pandas groupby().transform: per-group statistic broadcast back to
    // every row (mean-centering) — an unbounded window aggregate, NOT a
    // join-back; one shuffle, decimal-exact mean for the hash gate.
    GQuery("groupby_transform",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .withColumn("grp_mean",
            sum($"value".cast(DecimalType(18, 2))).over(w).cast("double") /
              count(lit(1)).over(w))
          .select($"event_id", $"user_id",
            ($"value" - $"grp_mean").as("centered"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
                value - (CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                         / COUNT(*) OVER w) AS centered
              FROM events WHERE user_id < 20
              WINDOW w AS (PARTITION BY user_id)
              ORDER BY event_id""")),

    // pandas ffill per key: carry the last non-null observation forward
    // (same last(ignoreNulls) machinery the as-of join uses).
    GQuery("ffill",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .withColumn("v", when($"value" < 10.0, lit(null)).otherwise($"value"))
          .select($"event_id", $"user_id",
            last($"v", ignoreNulls = true).over(w).as("v_filled"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
                LAST_VALUE(CASE WHEN value < 10.0 THEN NULL ELSE value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS v_filled
              FROM events WHERE user_id < 20
              ORDER BY event_id""")),

    // dask map_overlap: imperative trailing-window function via the
    // typed halo iterator (graft.ops.MapOverlap) — same 3-row rolling
    // mean the declarative frame computes, proving the typed path gives
    // identical results (exact-decimal accumulation keeps it
    // order-free and oracle-safe).
    GQuery("map_overlap",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id", $"ts", $"value")
        graft.ops.MapOverlap.trailing(
            ev, "user_id", Seq("ts", "event_id"), overlap = 2) { (r, win) =>
          var acc = java.math.BigDecimal.ZERO
          win.foreach { w =>
            acc = acc.add(java.math.BigDecimal.valueOf(w.getDouble(3))
              .setScale(2, java.math.RoundingMode.HALF_UP))
          }
          (r.getLong(0), r.getLong(1),
            acc.doubleValue / win.size)
        }.toDF("user_id", "event_id", "roll_mean")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  / COUNT(*) OVER w AS roll_mean
              FROM events WHERE user_id < 20
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id""")),

    // UNBOUNDED global ranking + quantile bucketing — the scale-safe
    // answer to window_ntile's bounded no-partition window: the global
    // row number comes from ops/DistributedSelect.withGlobalRowNumber
    // (range buckets + parallel per-bucket windows + offsets; no
    // single-task sort), and NTILE's rank arithmetic is applied to it.
    GQuery("ntile_global",
      (s, dir) => {
        import s.implicits._
        graft.ops.DistributedSelect.withGlobalRowNumber(
            Tables(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            "o_totalprice", "o_orderkey")
          .withColumn("q", expr("n_total div 4"))
          .withColumn("r", $"n_total" % 4)
          .withColumn("quartile_bucket", expr(
            """CASE WHEN rn <= r * (q + 1) THEN (rn + q) div (q + 1)
                    ELSE r + ((rn - r * (q + 1) + q - 1) div q) END"""))
          .select($"o_orderkey", $"rn", $"quartile_bucket")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
                ROW_NUMBER() OVER w AS rn,
                NTILE(4) OVER w AS quartile_bucket
              FROM orders
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")),

    GQuery("top_k",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
              LIMIT 100"""))
  )
}
