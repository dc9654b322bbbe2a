package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** pandas/dask DataFrame-surface parity ops beyond the core relational
  * set (SURVEY.md §2.2/§2.5 long tail): binning, diff/pct_change,
  * ordered dedup, rank methods, time resample, interpolation, one-hot,
  * crosstab, merge indicator. Each is a declarative single-pass plan —
  * per-key windows (state bounded by the key) or plain aggregations —
  * so all of them scale exactly like the core groupby/window ops.
  */
object PandasQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    // pandas.cut: fixed-width binning (100k bands of o_totalprice) +
    // per-bin stats. Pure column arithmetic, embarrassingly parallel.
    GQuery("cut",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .withColumn("bin", floor($"o_totalprice" / 100000.0).cast("long"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), Det.dsum($"o_totalprice").as("sum_price"))
          .orderBy($"bin")
      },
      Some(s"""SELECT CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT) AS bin,
              COUNT(*) AS n, ${Det.sql.dsum("o_totalprice")} AS sum_price
              FROM orders GROUP BY 1 ORDER BY bin""")),

    // pandas qcut(4): quantile-based binning. Boundaries come from the
    // exact distributed selection machinery (ops/DistributedSelect —
    // sketch → bucket → offsets, no single-task sort), collapse to ONE
    // row that broadcast-cross-joins back onto the data for the bin
    // assignment — boundary computation and assignment are both
    // shuffle-light and no value ever visits the driver. Ties at a
    // boundary all fall to the lower bin (v <= b), pandas semantics.
    GQuery("qcut",
      (s, dir) => {
        import s.implicits._
        def pick(q: Double)(n: org.apache.spark.sql.Column) =
          ceil(lit(q) * n).cast("long")
        val bounds = graft.ops.DistributedSelect.atRanks(
            Tables(s, dir, "orders").select($"o_totalprice", $"o_orderkey"),
            "o_totalprice", "o_orderkey",
            n => Seq(pick(0.25)(n), pick(0.5)(n), pick(0.75)(n)),
            labelsOfN = Some((n: org.apache.spark.sql.Column) => Seq(
              pick(0.25)(n) -> lit("p25"),
              pick(0.5)(n) -> lit("p50"),
              pick(0.75)(n) -> lit("p75"))))
          .agg(max(when($"label" === "p25", $"v")).as("b25"),
            max(when($"label" === "p50", $"v")).as("b50"),
            max(when($"label" === "p75", $"v")).as("b75"))
        Tables(s, dir, "orders")
          .crossJoin(broadcast(bounds))
          .withColumn("bin",
            when($"o_totalprice" <= $"b25", 0L)
              .when($"o_totalprice" <= $"b50", 1L)
              .when($"o_totalprice" <= $"b75", 2L)
              .otherwise(3L))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"),
            min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi"))
          .orderBy($"bin")
      },
      Some("""WITH r AS (
                SELECT o_totalprice AS v,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER () AS n
                FROM orders),
              b AS (
                SELECT
                  MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS b25,
                  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS b50,
                  MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS b75
                FROM r)
              SELECT CAST(CASE WHEN o_totalprice <= b25 THEN 0
                          WHEN o_totalprice <= b50 THEN 1
                          WHEN o_totalprice <= b75 THEN 2
                          ELSE 3 END AS BIGINT) AS bin,
                COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
              FROM orders, b GROUP BY 1 ORDER BY bin""")),

    // pandas diff/pct_change per key over event time: lag arithmetic on
    // the same IEEE doubles both engines read from parquet — exact.
    GQuery("diff_pct_change",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id",
            ($"value" - lag($"value", 1).over(w)).as("diff"),
            ($"value" / lag($"value", 1).over(w) - 1.0).as("pct_change"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                value - LAG(value, 1) OVER w AS diff,
                value / LAG(value, 1) OVER w - 1.0 AS pct_change
              FROM events WHERE user_id < 20
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, event_id""")),

    // pandas drop_duplicates(keep='last') with an explicit time order:
    // latest event per user via a per-key row_number — unlike Spark's
    // dropDuplicates, the KEPT row is deterministic.
    GQuery("dedup_keep_last",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"event_type", $"value")
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn = 1 ORDER BY user_id""")),

    // pandas rank(method=min|dense|pct|average) in one pass. The
    // 'average' method = min_rank + (ties-1)/2 — an exact int ratio, so
    // the double is bit-identical across engines.
    GQuery("rank_methods",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal")
        val ties = Window.partitionBy($"s_nationkey", $"s_acctbal")
        Tables(s, dir, "supplier")
          .select($"s_nationkey", $"s_suppkey", $"s_acctbal",
            rank().over(w).cast("long").as("rnk_min"),
            dense_rank().over(w).cast("long").as("rnk_dense"),
            percent_rank().over(w).as("rnk_pct"),
            (rank().over(w) + (count(lit(1)).over(ties) - 1) / 2.0).as("rnk_avg"))
          .orderBy($"s_nationkey", $"s_suppkey")
      },
      Some("""SELECT s_nationkey, s_suppkey, s_acctbal,
                RANK() OVER w AS rnk_min,
                DENSE_RANK() OVER w AS rnk_dense,
                PERCENT_RANK() OVER w AS rnk_pct,
                RANK() OVER w + (COUNT(*) OVER (PARTITION BY s_nationkey, s_acctbal) - 1) / 2.0 AS rnk_avg
              FROM supplier
              WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
              ORDER BY s_nationkey, s_suppkey""")),

    // pandas resample('1D').ohlc(): daily open/high/low/close of the
    // event value. first/last over a totally-ordered full-frame window
    // per day — per-key state, no global sort.
    GQuery("resample_ohlc",
      (s, dir) => {
        import s.implicits._
        val day = to_date(date_trunc("DAY", $"ts")).as("day")
        val w = Window.partitionBy($"day").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "events")
          .select(day, $"ts", $"event_id", $"value")
          .select($"day",
            first($"value").over(w).as("open"),
            max($"value").over(w).as("high"),
            min($"value").over(w).as("low"),
            last($"value").over(w).as("close"))
          .distinct()
          .orderBy($"day")
      },
      Some("""SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                first_value(value) OVER w AS open,
                max(value) OVER w AS high,
                min(value) OVER w AS low,
                last_value(value) OVER w AS close
              FROM events
              WINDOW w AS (PARTITION BY CAST(date_trunc('day', ts) AS DATE)
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY day""")),

    // pandas asfreq('6H', method='ffill') per key — UPSAMPLING onto a
    // regular spine. The spine is generated distributed (per-key
    // min/max bounds → `sequence` → explode: no driver loop, spine
    // size scales with keys × range, not with events), and the fill is
    // the as-of backward machinery (ops/AsOfJoin: ONE key shuffle, a
    // single forward merge per key — not a per-spine-point lookup).
    // Leading spine points before a key's first event stay null,
    // pandas semantics. Tie-break pinned to max (ts, event_id) on both
    // engines, as in join_asof.
    GQuery("resample_upsample",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .filter($"user_id" < 4)
          .select($"user_id", $"ts", $"value", $"event_id".as("ev_id"))
        val spine = ev.groupBy($"user_id")
          .agg(min($"ts").as("lo"), max($"ts").as("hi"))
          .select($"user_id", explode(sequence(
            date_trunc("DAY", $"lo"), $"hi", expr("INTERVAL 6 HOURS"))).as("ts"))
        graft.ops.AsOfJoin.backward(spine, ev, key = "user_id", ts = "ts",
            rightCols = Seq("value", "ev_id"))
          .select($"user_id", $"ts", $"value", $"ev_id")
          .orderBy($"user_id", $"ts")
      },
      Some("""WITH ev AS (
                SELECT user_id, ts, value, event_id FROM events
                WHERE user_id < 4),
              b AS (
                SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
                FROM ev GROUP BY user_id),
              spine AS (
                SELECT user_id,
                  unnest(generate_series(date_trunc('day', lo), hi,
                    INTERVAL 6 HOUR)) AS ts
                FROM b)
              SELECT s.user_id, s.ts,
                (SELECT e.value FROM ev e
                 WHERE e.user_id = s.user_id AND e.ts <= s.ts
                 ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS value,
                (SELECT e.event_id FROM ev e
                 WHERE e.user_id = s.user_id AND e.ts <= s.ts
                 ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS ev_id
              FROM spine s ORDER BY user_id, ts""")),

    // pandas interpolate(method='linear') per key: 'error' rows are
    // nulled and re-filled by linear interpolation between the
    // surrounding non-null values at their row positions (head stays
    // null, tail forward-fills — pandas default). Two bounded-frame
    // window scans, per-key state only.
    GQuery("interpolate",
      (s, dir) => {
        import s.implicits._
        val base = Tables(s, dir, "events")
          .filter($"user_id" < 20)
          .withColumn("v0", when($"event_type" =!= "error", $"value"))
        val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val withRn = base.withColumn("rn", row_number().over(ord))
        val wb = ord.rowsBetween(Window.unboundedPreceding, -1)
        val wf = ord.rowsBetween(1, Window.unboundedFollowing)
        withRn
          .withColumn("pv", last($"v0", ignoreNulls = true).over(wb))
          .withColumn("pr", last(when($"v0".isNotNull, $"rn"), ignoreNulls = true).over(wb))
          .withColumn("nv", first($"v0", ignoreNulls = true).over(wf))
          .withColumn("nr", first(when($"v0".isNotNull, $"rn"), ignoreNulls = true).over(wf))
          .select($"user_id", $"event_id",
            when($"v0".isNotNull, $"v0")
              .when($"pv".isNull, lit(null))
              .when($"nv".isNull, $"pv")
              .otherwise($"pv" + ($"nv" - $"pv") * ($"rn" - $"pr") / ($"nr" - $"pr"))
              .as("value_interp"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, ts,
                  CASE WHEN event_type <> 'error' THEN value END AS v0
                FROM events WHERE user_id < 20),
              r AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM e),
              f AS (
                SELECT user_id, event_id, v0, rn,
                  last_value(v0 IGNORE NULLS) OVER wb AS pv,
                  last_value(CASE WHEN v0 IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS pr,
                  first_value(v0 IGNORE NULLS) OVER wf AS nv,
                  first_value(CASE WHEN v0 IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS nr
                FROM r
                WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       wf AS (PARTITION BY user_id ORDER BY rn
                              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
              SELECT user_id, event_id,
                CASE WHEN v0 IS NOT NULL THEN v0
                     WHEN pv IS NULL THEN NULL
                     WHEN nv IS NULL THEN pv
                     ELSE pv + (nv - pv) * (rn - pr) / (nr - pr) END AS value_interp
              FROM f ORDER BY user_id, event_id""")),

    // pandas get_dummies: one-hot encode the market segment. Pure
    // projection — the fixed category set keeps the schema static,
    // exactly like pandas with categorical dtype.
    GQuery("get_dummies",
      (s, dir) => {
        import s.implicits._
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val dummies = segs.map(g =>
          ($"c_mktsegment" === g).cast("long").as(s"seg_${g.toLowerCase}"))
        Tables(s, dir, "customer")
          .select($"c_custkey" +: dummies: _*)
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
                CAST(c_mktsegment = 'AUTOMOBILE' AS BIGINT) AS seg_automobile,
                CAST(c_mktsegment = 'BUILDING'   AS BIGINT) AS seg_building,
                CAST(c_mktsegment = 'FURNITURE'  AS BIGINT) AS seg_furniture,
                CAST(c_mktsegment = 'HOUSEHOLD'  AS BIGINT) AS seg_household,
                CAST(c_mktsegment = 'MACHINERY'  AS BIGINT) AS seg_machinery
              FROM customer ORDER BY c_custkey""")),

    // pandas.crosstab(nation, segment): contingency counts via
    // groupBy+pivot over the fixed category set — one shuffle on the
    // row key, map-side partials for the counts.
    GQuery("crosstab",
      (s, dir) => {
        import s.implicits._
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val ct = Tables(s, dir, "customer")
          .join(broadcast(Tables(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .pivot("c_mktsegment", segs)
          .agg(count(lit(1)))
          .na.fill(0L)
        segs.foldLeft(ct)((df, g) => df.withColumnRenamed(g, g.toLowerCase))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
                COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS automobile,
                COUNT(*) FILTER (c_mktsegment = 'BUILDING')   AS building,
                COUNT(*) FILTER (c_mktsegment = 'FURNITURE')  AS furniture,
                COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD')  AS household,
                COUNT(*) FILTER (c_mktsegment = 'MACHINERY')  AS machinery
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // pandas merge(indicator=True): full outer join + provenance column.
    GQuery("merge_indicator",
      (s, dir) => {
        import s.implicits._
        val users = Tables(s, dir, "events").select($"user_id").distinct()
        Tables(s, dir, "customer").select($"c_custkey")
          .join(users, $"c_custkey" === $"user_id", "full_outer")
          .select(coalesce($"c_custkey", $"user_id").as("id"),
            when($"user_id".isNull, "left_only")
              .when($"c_custkey".isNull, "right_only")
              .otherwise("both").as("merge_ind"))
          .orderBy($"id")
      },
      Some("""SELECT COALESCE(c_custkey, user_id) AS id,
                CASE WHEN user_id IS NULL THEN 'left_only'
                     WHEN c_custkey IS NULL THEN 'right_only'
                     ELSE 'both' END AS merge_ind
              FROM customer FULL OUTER JOIN (SELECT DISTINCT user_id FROM events) e
                ON c_custkey = user_id
              ORDER BY id""")),

    // pandas ewm(alpha=0.5).mean() with a bounded 32-observation
    // lookback — the state-bounded form a streaming engine actually
    // keeps (with α=0.5 the dropped tail weighs < 2^-32 ≈ 2e-10 of the
    // result). Hash-exactness: every weight is a power of two (x·2^-k
    // is EXACT in IEEE — just an exponent shift), and both engines
    // evaluate the same explicit left-associated addition tree, so the
    // rounding sequence is bit-identical — no Det decimal cast needed.
    // One window pass, 32 frame offsets, per-key state only.
    GQuery("ewm_mean",
      (s, dir) => {
        import s.implicits._
        graft.ops.RollingOps.ewmMean(
            Tables(s, dir, "events").filter($"user_id" < 20),
            "value", Seq($"user_id"), Seq($"ts", $"event_id"), lookback = EwmK)
          .select($"user_id", $"event_id", $"ewm")
          .orderBy($"user_id", $"event_id")
      },
      Some {
        def lagK(k: Int) = if (k == 0) "value" else s"LAG(value, $k) OVER w"
        val num = (0 until EwmK)
          .map(k => s"COALESCE(${lagK(k)}, 0.0) * ${pow2(-k)}").mkString(" + ")
        val den = (0 until EwmK)
          .map(k => s"CASE WHEN ${lagK(k)} IS NOT NULL THEN ${pow2(-k)} ELSE 0.0 END")
          .mkString(" + ")
        s"""SELECT user_id, event_id, ($num) / ($den) AS ewm
            FROM events WHERE user_id < 20
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id"""
      }),

    // pandas rolling(7).median() with the pandas DEFAULT min_periods
    // (= window size): the first 6 rows of each key emit NULL (pandas
    // NaN), full frames emit the exact median. Both sides sort the
    // explicit 7-element frame list and pick the middle — element
    // selection plus at most one (a+b)/2, identical IEEE ops, so no
    // interpolation-formula mismatch (quantile_cont's a+(b-a)·q rounds
    // differently). Frame state is 7 rows per key. Null handling is
    // pandas skipna on the Spark side (see RollingOps.rollingMedian);
    // events.value is NOT NULL so the oracle's plain list() windows
    // identically.
    GQuery("rolling_median",
      (s, dir) => {
        import s.implicits._
        graft.ops.RollingOps.rollingMedian(
            Tables(s, dir, "events").filter($"user_id" < 20),
            "value", 7, Seq($"user_id"), Seq($"ts", $"event_id"),
            minPeriods = 7)
          .select($"user_id", $"event_id", $"roll_median")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CASE WHEN len(arr) < 7 THEN NULL
                     WHEN len(arr) % 2 = 1 THEN arr[(len(arr)+1)//2]
                     ELSE (arr[len(arr)//2] + arr[len(arr)//2 + 1]) / 2.0 END
                  AS roll_median
              FROM (
                SELECT user_id, event_id, list_sort(list(value) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
                FROM events WHERE user_id < 20) t
              ORDER BY user_id, event_id""")),

    // pandas rolling(7, min_periods=1).quantile(0.25, 'linear'): exact
    // rolling lower quartile. Both sides run the LITERAL interpolation
    // formula a[lo] + (a[lo+1] − a[lo])·frac on the sorted frame (see
    // RollingOps.rollingQuantile — built-in quantile_cont factors the
    // lerp differently and can diverge in the last ulp). min_periods=1
    // exercises every partial-frame size 1..7, so pos/frac take all
    // seven dyadic values — a richer check than the always-full frame.
    GQuery("rolling_quantile",
      (s, dir) => {
        import s.implicits._
        graft.ops.RollingOps.rollingQuantile(
            Tables(s, dir, "events").filter($"user_id" < 20),
            "value", 7, 0.25, Seq($"user_id"), Seq($"ts", $"event_id"))
          .select($"user_id", $"event_id", $"roll_quantile")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                arr[lo + 1] + (arr[least(lo + 2, len(arr))] - arr[lo + 1])
                  * (pos - lo) AS roll_quantile
              FROM (
                SELECT user_id, event_id, arr,
                  (len(arr) - 1) * 0.25 AS pos,
                  CAST(floor((len(arr) - 1) * 0.25) AS INT) AS lo
                FROM (
                  SELECT user_id, event_id, list_sort(list(value) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
                  FROM events WHERE user_id < 20) t) t2
              ORDER BY user_id, event_id""")),

    // pandas groupby(...).cumcount(): 0-based running ordinal within the
    // key, time-ordered — one shuffle on the key, a single window pass.
    GQuery("groupby_cumcount",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables(s, dir, "events").filter($"user_id" < 50)
          .withColumn("cumcount", (row_number().over(w) - 1).cast("long"))
          .select($"user_id", $"event_id", $"cumcount")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS cumcount
              FROM events WHERE user_id < 50
              ORDER BY user_id, event_id""")),

    // pandas groupby(...).nlargest(k): top-3 suppliers by balance per
    // nation via a per-key row_number — one shuffle on the group key,
    // k rows of state per key (vs a global sort).
    GQuery("groupby_topk",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey")
          .orderBy($"s_acctbal".desc, $"s_suppkey")
        Tables(s, dir, "supplier")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"s_nationkey", $"rn".cast("long").as("rn"), $"s_suppkey", $"s_acctbal")
          .orderBy($"s_nationkey", $"rn")
      },
      Some("""SELECT s_nationkey, CAST(rn AS BIGINT) AS rn, s_suppkey, s_acctbal
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY s_nationkey
                      ORDER BY s_acctbal DESC, s_suppkey) AS rn
                    FROM supplier) t
              WHERE rn <= 3 ORDER BY s_nationkey, rn""")),

    // pandas combine_first: the latest order total per customer,
    // falling back to the account balance where a side is missing —
    // full outer join + coalesce, null-provenance preserved.
    GQuery("combine_first",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        val latest = Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_custkey", $"o_totalprice")
        Tables(s, dir, "customer").select($"c_custkey", $"c_acctbal")
          .join(latest, $"c_custkey" === $"o_custkey", "full_outer")
          .select(coalesce($"c_custkey", $"o_custkey").as("id"),
            coalesce($"o_totalprice", $"c_acctbal").as("combined"),
            $"o_totalprice".isNotNull.as("from_orders"))
          .orderBy($"id")
      },
      Some("""WITH latest AS (
                SELECT o_custkey, o_totalprice FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders) t WHERE rn = 1)
              SELECT COALESCE(c_custkey, o_custkey) AS id,
                COALESCE(o_totalprice, c_acctbal) AS combined,
                o_totalprice IS NOT NULL AS from_orders
              FROM customer FULL OUTER JOIN latest ON c_custkey = o_custkey
              ORDER BY id""")),

    // Gap-based sessionization (the classic event-pipeline op): a new
    // session starts after a >30 min silence; session ids are a per-key
    // running sum of boundary flags. Integer time arithmetic only —
    // exact. One shuffle on user_id, O(1) state per row.
    GQuery("sessionize",
      (s, dir) => {
        import s.implicits._
        graft.ops.RollingOps.sessionize(
            Tables(s, dir, "events").filter($"user_id" < 20),
            "ts", 1800L, Seq($"user_id"), Seq($"ts", $"event_id"))
          .select($"user_id", $"event_id", $"session_id")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (
                SELECT user_id, event_id, ts,
                  CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS boundary
                FROM events WHERE user_id < 20
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
              ORDER BY user_id, event_id""")),

    // pandas clip(lower, upper): pure codegen column arithmetic on the
    // IEEE doubles both engines read from parquet — exact, no shuffle.
    GQuery("clip",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .filter($"l_orderkey" < 3000)
          .select($"l_orderkey", $"l_linenumber",
            least(greatest($"l_quantity", lit(5.0)), lit(45.0)).as("qty_clip"),
            greatest($"l_extendedprice", lit(10000.0)).as("price_floor"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                LEAST(GREATEST(l_quantity, 5.0), 45.0) AS qty_clip,
                GREATEST(l_extendedprice, 10000.0) AS price_floor
              FROM lineitem WHERE l_orderkey < 3000
              ORDER BY l_orderkey, l_linenumber""")),

    // pandas winsorization (clip at the p05/p95 order statistics,
    // scipy.stats.mstats.winsorize semantics with exact ranks): the
    // thresholds come from DistributedSelect's bucketed exact selection
    // (sketch pass + one local sort of only the two hit buckets — never
    // a global sort), collapse to a 1-row frame, and broadcast onto the
    // rows as a plain crossJoin. No arithmetic touches the doubles —
    // values pass through or are replaced by another observed value —
    // so the oracle is hash-exact by construction.
    GQuery("winsorize",
      (s, dir) => {
        import s.implicits._
        def pick(q: Double)(n: org.apache.spark.sql.Column) =
          ceil(lit(q) * n).cast("long")
        val ev = Tables(s, dir, "events")
        val sel = graft.ops.DistributedSelect.atRanks(
          ev.select($"value", $"event_id"), "value", "event_id",
          n => Seq(pick(0.05)(n), pick(0.95)(n)),
          labelsOfN = Some((n: org.apache.spark.sql.Column) => Seq(
            pick(0.05)(n) -> lit("lo"), pick(0.95)(n) -> lit("hi"))))
        val bounds = sel.groupBy().agg(
          max(when($"label" === "lo", $"v")).as("lo"),
          max(when($"label" === "hi", $"v")).as("hi"))
        ev.filter($"event_id" < 2000)
          .crossJoin(broadcast(bounds))
          .select($"event_id",
            least(greatest($"value", $"lo"), $"hi").as("v_wins"))
          .orderBy($"event_id")
      },
      Some("""WITH r AS (
                SELECT value AS v,
                  ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
                  COUNT(*) OVER () AS n
                FROM events),
              b AS (
                SELECT
                  MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN v END) AS lo,
                  MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS hi
                FROM r)
              SELECT event_id, LEAST(GREATEST(value, lo), hi) AS v_wins
              FROM events, b WHERE event_id < 2000 ORDER BY event_id""")),

    // pandas duplicated(keep='first'): a per-text window flags every
    // copy after the first (order = doc_id). One shuffle on the dup
    // key; O(1) state per row — the mark-don't-drop half of dedup.
    GQuery("duplicated_flag",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .withColumn("dup", row_number().over(
            Window.partitionBy($"text").orderBy($"doc_id")) > 1)
          .select($"doc_id", $"dup")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
                ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) > 1 AS dup
              FROM documents ORDER BY doc_id""")),

    // pandas groupby.idxmax: the row LABEL at each group's max —
    // max_by over a (value, -id) struct so ties break to the smallest
    // id exactly like idxmax's first-occurrence rule. One map-side-
    // combined aggregation; contrast with the window formulation which
    // shuffles every row THEN filters to one per group.
    GQuery("groupby_idxmax",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(max_by($"o_orderkey",
              struct($"o_totalprice", (-$"o_orderkey").as("tb"))).as("idx_max"),
            max($"o_totalprice").as("max_price"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey AS idx_max, max_price FROM (
                SELECT o_custkey, o_orderkey,
                  MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders) t WHERE rn = 1 ORDER BY o_custkey""")),

    // pandas mode(): most frequent value per group, ties to the
    // smallest value (pandas returns the sorted list; this keeps its
    // head). The full table collapses through ONE map-side-combined
    // count per (group, value) — the only pass over the data — and the
    // tie-breaking rank window runs on that tiny distinct-pairs frame,
    // never a global value sort.
    GQuery("mode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(Window.partitionBy($"l_returnflag")
            .orderBy($"cnt".desc, $"l_linestatus".asc)))
          .filter($"rn" === 1)
          .select($"l_returnflag", $"l_linestatus".as("naive_mode"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, l_linestatus AS naive_mode FROM (
                SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY COUNT(*) DESC, l_linestatus ASC) AS rn
                FROM lineitem GROUP BY 1, 2) t
              WHERE rn = 1 ORDER BY l_returnflag""")),

    // pandas groupby().skew() / .kurt(): adjusted Fisher–Pearson G1 and
    // excess-kurtosis G2 from EXACT power sums. Skew/kurt are scale-
    // invariant, so everything runs in integer space w = 100·value
    // (exact for 2-dp data): w,w²,w³,w⁴ are int64-exact per row, and
    // the w³/w⁴ group sums — which exceed 2⁵³ and would take engine-
    // specific rounding paths on a decimal→double cast (the bug this
    // shape fixes) — are summed as exactly-representable hi/lo halves
    // (split at 2²⁵) and reconstructed with one identical IEEE
    // multiply-add on both sides. w⁴ itself is NEVER materialized
    // per-row (it would pass 2⁶³ at |v| ≈ 551 — and sf0.1 holds
    // 560.21): the w³ halves are each multiplied by w instead, exact
    // by distributivity. One map-side-combined aggregation: the
    // canonical moments-sketch shape, 7 longs per group per partition
    // shuffle at any scale. Exact while |value| < 1000 and group
    // sizes < ~10⁶ rows (then: lower the split bit or pre-aggregate).
    GQuery("groupby_skew_kurt",
      (s, dir) => {
        import s.implicits._
        val lo25 = lit((1L << 25) - 1)
        val d = Tables(s, dir, "events")
          .select($"event_type",
            ($"value".cast("decimal(8,2)") * 100).cast("long").as("w"))
          .withColumn("w2", $"w" * $"w")
          .withColumn("w3", $"w2" * $"w")
        val sums = d.groupBy($"event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum($"w").cast("double").as("s1"),
          sum($"w2").cast("double").as("s2"),
          sum(shiftright($"w3", 25)).cast("double").as("hi3"),
          sum($"w3".bitwiseAND(lo25)).cast("double").as("lo3"),
          sum(shiftright($"w3", 25) * $"w").cast("double").as("hi4"),
          sum($"w3".bitwiseAND(lo25) * $"w").cast("double").as("lo4"))
        val n = $"n"; val s1 = $"s1"; val s2 = $"s2"
        val s3 = $"hi3" * 33554432.0 + $"lo3"
        val s4 = $"hi4" * 33554432.0 + $"lo4"
        val a = n * s2 - s1 * s1
        sums.select(
          $"event_type",
          n.cast("long").as("n"),
          (a / (n * (n - 1.0)) / 10000.0).as("var_samp"),
          ((sqrt(n * (n - 1.0)) / (n - 2.0))
            * (n * n * s3 - lit(3.0) * n * s1 * s2 + lit(2.0) * s1 * s1 * s1)
            / sqrt(a * a * a)).as("skew"),
          (((n + 1.0) * (
              (n * n * n * s4 - lit(4.0) * n * n * s1 * s3
                + lit(6.0) * n * s1 * s1 * s2 - lit(3.0) * s1 * s1 * s1 * s1)
              / (a * a) - 3.0) + 6.0)
            * (n - 1.0) / ((n - 2.0) * (n - 3.0))).as("kurt")
        ).orderBy($"event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                  CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS w FROM events),
              p AS (SELECT event_type, w, w * w AS w2, w * w * w AS w3 FROM d),
              s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS s1,
                  CAST(CAST(SUM(w2) AS BIGINT) AS DOUBLE) AS s2,
                  CAST(CAST(SUM(w3 >> 25) AS BIGINT) AS DOUBLE) AS hi3,
                  CAST(CAST(SUM(w3 & 33554431) AS BIGINT) AS DOUBLE) AS lo3,
                  CAST(CAST(SUM((w3 >> 25) * w) AS BIGINT) AS DOUBLE) AS hi4,
                  CAST(CAST(SUM((w3 & 33554431) * w) AS BIGINT) AS DOUBLE) AS lo4
                FROM p GROUP BY event_type)
              SELECT event_type, CAST(n AS BIGINT) AS n,
                (n * s2 - s1 * s1) / (n * (n - 1.0)) / 10000.0 AS var_samp,
                (sqrt(n * (n - 1.0)) / (n - 2.0))
                  * (n * n * (hi3 * 33554432.0 + lo3) - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1)
                  / sqrt((n * s2 - s1 * s1) * (n * s2 - s1 * s1) * (n * s2 - s1 * s1)) AS skew,
                ((n + 1.0) * (
                    (n * n * n * (hi4 * 33554432.0 + lo4) - 4.0 * n * n * s1 * (hi3 * 33554432.0 + lo3)
                      + 6.0 * n * s1 * s1 * s2 - 3.0 * s1 * s1 * s1 * s1)
                    / ((n * s2 - s1 * s1) * (n * s2 - s1 * s1)) - 3.0) + 6.0)
                  * (n - 1.0) / ((n - 2.0) * (n - 3.0)) AS kurt
              FROM s ORDER BY event_type""")),

    // pandas expanding().mean()/.max(): unbounded-preceding frame per
    // user. The expanding sum is an exact decimal (order-free), so the
    // running mean = sum/rn is one deterministic double division.
    // Per-key window state only — scales like every §2.5 window op.
    GQuery("expanding_stats",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events").filter($"user_id" < 40)
          .select($"user_id", $"event_id",
            (sum($"value".cast("decimal(18,2)")).over(w).cast("double")
              / row_number().over(
                  Window.partitionBy($"user_id").orderBy($"ts", $"event_id"))
                .cast("double")).as("exp_mean"),
            max($"value").over(w).as("exp_max"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                / CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
                  AS exp_mean,
                MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exp_max
              FROM events WHERE user_id < 40
              ORDER BY user_id, event_id""")),

    // pandas Series.autocorr(): lag-1 Pearson per user. One lag window
    // (per-key state) then one moments aggregation over the (x, y =
    // x.shift(1)) pairs — exact decimal sums, identical IEEE Pearson
    // on both sides, zero-variance keys nulled before sqrt.
    GQuery("autocorr",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val pairs = Tables(s, dir, "events").filter($"user_id" < 40)
          .select($"user_id", $"value".cast("decimal(8,2)").as("x"),
            lag($"value".cast("decimal(8,2)"), 1).over(w).as("y"))
          .filter($"y".isNotNull)
        val sums = pairs.groupBy($"user_id").agg(
          count(lit(1)).cast("double").as("n"),
          sum($"x").cast("double").as("sx"),
          sum($"y").cast("double").as("sy"),
          sum(($"x" * $"y").cast("decimal(20,4)")).cast("double").as("sxy"),
          sum(($"x" * $"x").cast("decimal(20,4)")).cast("double").as("sxx"),
          sum(($"y" * $"y").cast("decimal(20,4)")).cast("double").as("syy"))
        val n = $"n"; val sx = $"sx"; val sy = $"sy"
        sums.select($"user_id", n.cast("long").as("n_pairs"),
          when(n < 2.0 || n * $"sxx" - sx * sx <= 0.0
              || n * $"syy" - sy * sy <= 0.0, lit(null).cast("double"))
            .otherwise((n * $"sxy" - sx * sy)
              / (sqrt(n * $"sxx" - sx * sx) * sqrt(n * $"syy" - sy * sy)))
            .as("autocorr"))
          .orderBy($"user_id")
      },
      Some("""WITH o AS (
                SELECT user_id, CAST(value AS DECIMAL(8,2)) AS x,
                  LAG(CAST(value AS DECIMAL(8,2)), 1)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
                FROM events WHERE user_id < 40),
              p AS (SELECT * FROM o WHERE y IS NOT NULL),
              s AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(x * y AS DECIMAL(20,4))) AS DOUBLE) AS sxy,
                  CAST(SUM(CAST(x * x AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(y * y AS DECIMAL(20,4))) AS DOUBLE) AS syy
                FROM p GROUP BY user_id)
              SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
                CASE WHEN n < 2.0 OR n * sxx - sx * sx <= 0.0
                       OR n * syy - sy * sy <= 0.0 THEN NULL
                     ELSE (n * sxy - sx * sy)
                          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                END AS autocorr
              FROM s ORDER BY user_id""")),

    // pandas rank(pct=True) family: percent_rank ((rank-1)/(n-1)) and
    // cume_dist — both rank-based, tie-stable, and a single identical
    // double division in each engine. Per-key window state only.
    GQuery("window_percent_rank",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
        Tables(s, dir, "orders").filter($"o_custkey" < 200)
          .select($"o_orderkey", $"o_orderpriority",
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy($"o_orderpriority", $"pct_rank", $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
                PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
                CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume
              FROM orders WHERE o_custkey < 200
              ORDER BY o_orderpriority, pct_rank, o_orderkey""")),

    // z-score outlier detection (scale-up pipeline hygiene op): flag
    // rows > 3σ from their group mean. z² = (n·x − s1)² / (n·s2 − s1²)
    // — all from exact decimal sums, so the filter boundary is the
    // same double comparison in both engines (no sqrt needed at all).
    // The 5-row stats table broadcasts back onto the fact scan: one
    // aggregation + one broadcast join, no second shuffle.
    GQuery("outlier_zscore",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .select($"event_id", $"event_type",
            $"value".cast("decimal(8,2)").cast("double").as("x"))
        val stats = ev.groupBy($"event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum($"x".cast("decimal(18,2)")).cast("double").as("s1"),
          sum(($"x".cast("decimal(8,2)") * $"x".cast("decimal(8,2)"))
            .cast("decimal(20,4)")).cast("double").as("s2"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("zsq",
            ($"n" * $"x" - $"s1") * ($"n" * $"x" - $"s1")
              / ($"n" * $"s2" - $"s1" * $"s1"))
          .filter($"zsq" > 9.0)
          .select($"event_id", $"event_type", $"x".as("value"), $"zsq")
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
                SELECT event_id, event_type,
                  CAST(CAST(value AS DECIMAL(8,2)) AS DOUBLE) AS x FROM events),
              st AS (
                SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(CAST(x AS DECIMAL(8,2)) * CAST(x AS DECIMAL(8,2)) AS DECIMAL(20,4))) AS DOUBLE) AS s2
                FROM ev GROUP BY event_type)
              SELECT event_id, ev.event_type, x AS value,
                (n * x - s1) * (n * x - s1) / (n * s2 - s1 * s1) AS zsq
              FROM ev JOIN st ON ev.event_type = st.event_type
              WHERE (n * x - s1) * (n * x - s1) / (n * s2 - s1 * s1) > 9.0
              ORDER BY event_id""")),

    // pandas.factorize(sort=True) / dask categorize: dictionary-encode a
    // string column to dense integer codes. The scale-critical shape:
    // the ordering window that assigns codes runs over the DISTINCT
    // value set (the dictionary — 25 brands here, maybe thousands at
    // 100 TB), NEVER over the fact table; the fact side then picks up
    // its code via a broadcast hash join — zero fact-table shuffle, no
    // global sort of the corpus. A naive dense_rank() over the raw
    // table would be a single-task total sort at any scale.
    GQuery("factorize",
      (s, dir) => {
        import s.implicits._
        val part = Tables(s, dir, "part")
        val dict = part.select($"p_brand").distinct()
          .withColumn("brand_code",
            (dense_rank().over(Window.orderBy($"p_brand")) - 1).cast("long"))
        part.join(broadcast(dict), Seq("p_brand"))
          .select($"p_partkey", $"p_brand", $"brand_code")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_brand,
                DENSE_RANK() OVER (ORDER BY p_brand) - 1 AS brand_code
              FROM part ORDER BY p_partkey"""))
  ) :+ rollingCorr

  /** ewm lookback depth (bounded state; tail weight 2^-32 ≈ 2e-10). */
  private val EwmK = 32

  /** pandas rolling(10).corr() — here the rolling Pearson correlation
    * of the value against its time-order index (rolling trend). All
    * six window sums are EXACT (decimal for value terms, integers for
    * index terms — order-free), cast to double once, then the Pearson
    * formula is the same explicit IEEE op sequence in both engines;
    * zero-variance frames are nulled BEFORE sqrt so no NaN can leak.
    * One window pass, per-key state only.
    */
  private[queries] val rollingCorr: GQuery =
    GQuery("rolling_corr",
      (s, dir) => {
        import s.implicits._
        graft.ops.RollingOps.rollingTrendCorr(
            Tables(s, dir, "events").filter($"user_id" < 20),
            "value", Seq($"user_id"), Seq($"ts", $"event_id"), window = 10)
          .select($"user_id", $"event_id", $"roll_trend")
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH r AS (
                SELECT user_id, event_id, ts, value,
                  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS BIGINT) AS rn
                FROM events WHERE user_id < 20),
              s AS (
                SELECT user_id, event_id,
                  CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
                  CAST(SUM(rn) OVER w AS DOUBLE) AS sy,
                  CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(rn AS DECIMAL(10,0))) OVER w AS DOUBLE) AS sxy,
                  CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sxx,
                  CAST(SUM(rn * rn) OVER w AS DOUBLE) AS syy
                FROM r
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
              SELECT user_id, event_id,
                CASE WHEN n < 2.0 OR n * sxx - sx * sx <= 0.0
                       OR n * syy - sy * sy <= 0.0 THEN NULL
                     ELSE (n * sxy - sx * sy)
                          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                END AS roll_trend
              FROM s ORDER BY user_id, event_id"""))

  /** Exact power of two as its shortest round-trip double literal —
    * parses to the identical IEEE value in both Scala and DuckDB.
    */
  private def pow2(k: Int): Double = math.pow(2.0, k)
}
