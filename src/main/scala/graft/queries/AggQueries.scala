package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Det, Tables}
import graft.ops.WeightedMean

/** §2.4 aggregation. The reference's chunk-partial → concat → re-agg
  * model [P] is exactly Spark's HashAggregateExec partial/final
  * pipeline; everything here is declarative groupBy/agg so map-side
  * combine, spill, and AQE partition coalescing all apply unchanged at
  * 100 TB. Double sums go through exact decimals (graft.engine.Det).
  */
object AggQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    GQuery("agg_global",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          Det.dsum($"l_quantity").as("sum_qty"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          Det.davg($"l_extendedprice").as("avg_price"))
      },
      Some(s"""SELECT COUNT(*) AS n_rows,
              ${Det.sql.dsum("l_quantity")} AS sum_qty,
              MIN(l_extendedprice) AS min_price,
              MAX(l_extendedprice) AS max_price,
              ${Det.sql.davg("l_extendedprice")} AS avg_price
              FROM lineitem""")),

    GQuery("groupby_agg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
               Det.dsum($"l_extendedprice").as("sum_price"),
               min($"l_quantity").as("min_qty"),
               max($"l_quantity").as("max_qty"))
          .orderBy($"l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
              ${Det.sql.dsum("l_extendedprice")} AS sum_price,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    GQuery("groupby_multi",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .groupBy($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               Det.dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              ${Det.sql.dsum("o_totalprice")} AS sum_price
              FROM orders GROUP BY o_orderstatus, o_orderpriority
              ORDER BY o_orderstatus, o_orderpriority""")),

    GQuery("distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    GQuery("count_distinct",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .agg(countDistinct($"l_partkey").as("n_parts"),
               countDistinct($"l_suppkey").as("n_supps"))
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts,
              COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem""")),

    // groups ≈ rows (event_id is unique-grade): dask split_out shape —
    // pre-clustered single complete aggregate, no useless partial pass
    // (see graft.ops.HighCardAgg; plan asserted in PlanSpec).
    GQuery("groupby_highcard",
      (s, dir) => {
        import s.implicits._
        graft.ops.HighCardAgg.groupAgg(
            Tables(s, dir, "events").select($"event_id", $"value"),
            splitOut = 64, Seq("event_id"),
            Seq(count(lit(1)).as("n"), Det.dsum($"value").as("sum_value")))
          .orderBy($"event_id")
      },
      Some(s"""SELECT event_id, COUNT(*) AS n, ${Det.sql.dsum("value")} AS sum_value
              FROM events GROUP BY event_id ORDER BY event_id""")),

    // HLL++ estimates differ per engine, so the ESTIMATE can't be
    // hash-compared — but the tolerance VERDICT can (SURVEY §2.4's named
    // upgrade): emit the exact distinct count plus the boolean gate
    // |est − exact| / exact ≤ 3×rsd, and the oracle asserts the same
    // exact count with the gate literally TRUE. A drifting sketch now
    // FAILS the hash compare instead of hiding behind a rows-only
    // check. The rsd is PINNED in the query (0.05, HLL++'s default)
    // and the gate is three standard deviations of the sketch's
    // designed relative error (round-15 ADVICE fix: the previous 1×rsd
    // gate was ~1σ — deterministic per dataset, but at an unvalidated
    // scale factor the estimate can legitimately sit past 1σ and the
    // key would permanently fail; 3σ bounds the false-failure rate at
    // ~0.3% while still catching a broken sketch. Validated green at
    // sf0.001/0.01/0.1: observed |err| ≤ 1.2% of exact there). The
    // exact countDistinct here is the GRADING harness, not the
    // operator — a 100 TB user runs the approx_count_distinct alone
    // (one pass, no distinct shuffle).
    GQuery("approx_distinct",
      (s, dir) => {
        import s.implicits._
        val rsd = 0.05 // pinned: approx_count_distinct's default
        Tables(s, dir, "lineitem")
          .agg(approx_count_distinct($"l_partkey", rsd).as("est"),
               countDistinct($"l_partkey").as("exact_parts"))
          .select($"exact_parts",
            (abs($"est" - $"exact_parts").cast("double") /
              $"exact_parts" <= lit(3 * rsd)).as("within_tol"))
      },
      Some("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              TRUE AS within_tol FROM lineitem""")),

    GQuery("value_counts",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy($"event_type").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              GROUP BY event_type ORDER BY n DESC, event_type""")),

    // describe(): count/mean/std/min/max; stddev from exact decimal moments
    // so the result is order-free (see Det): sqrt((s2 - s1^2/n)/(n-1)).
    GQuery("describe",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .agg(
            count($"o_totalprice").as("n"),
            sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("s1"),
            sum(($"o_totalprice" * $"o_totalprice").cast(DecimalType(18, 4)))
              .cast("double").as("s2"),
            min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price"))
          .select($"n",
            ($"s1" / $"n").as("mean_price"),
            sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("std_price"),
            $"min_price", $"max_price")
      },
      Some("""WITH m AS (
                SELECT COUNT(o_totalprice) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s2,
                  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
                FROM orders)
              SELECT n, s1 / n AS mean_price,
                sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_price,
                min_price, max_price FROM m""")),

    // Exact median via rank selection — deterministic in both engines
    // (no engine-specific quantile interpolation). Spark side is the
    // distributed-selection plan (graft.ops.DistributedSelect): range
    // buckets + per-bucket offsets, local sort only in the bucket(s)
    // holding the middle ranks — no driver action, no single-task
    // global window.
    GQuery("median",
      (s, dir) => {
        import s.implicits._
        graft.ops.DistributedSelect.atRanks(
            Tables(s, dir, "orders").select($"o_totalprice", $"o_orderkey"),
            "o_totalprice", "o_orderkey",
            n => Seq(floor((n + lit(1)) / lit(2)), floor((n + lit(2)) / lit(2))))
          .agg((sum($"v") / count($"v")).as("median_price"))
      },
      Some("""WITH r AS (
                SELECT o_totalprice AS v,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER () AS n
                FROM orders)
              SELECT SUM(v) / COUNT(v) AS median_price FROM r
              WHERE rn IN ((n + 1) // 2, (n + 2) // 2)""")),

    // Per-group describe (dask groupby().describe()): decimal moments
    // per key, std from exact sums.
    GQuery("groupby_describe",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            count($"o_totalprice").as("n"),
            sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("s1"),
            sum(($"o_totalprice" * $"o_totalprice").cast(DecimalType(18, 4)))
              .cast("double").as("s2"),
            min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price"))
          .select($"o_orderstatus", $"n",
            ($"s1" / $"n").as("mean_price"),
            sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("std_price"),
            $"min_price", $"max_price")
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, n, s1 / n AS mean_price,
                sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_price,
                min_price, max_price
              FROM (
                SELECT o_orderstatus, COUNT(o_totalprice) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s2,
                  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
                FROM orders GROUP BY o_orderstatus) t
              ORDER BY o_orderstatus""")),

    // Exact quartiles via rank selection (no engine-specific quantile
    // interpolation): value at ceil(q·n) of the sorted order, same
    // distributed-selection plan as `median`. The rank→label mapping
    // needs n, so it is re-derived in-plan from the returned ranks
    // (count window over the ≤3 selected rows — trivial).
    GQuery("quartiles",
      (s, dir) => {
        import s.implicits._
        def pick(q: Double)(n: org.apache.spark.sql.Column) =
          ceil(lit(q) * n).cast("long")
        val sel = graft.ops.DistributedSelect.atRanks(
          Tables(s, dir, "orders").select($"o_totalprice", $"o_orderkey"),
          "o_totalprice", "o_orderkey",
          n => Seq(pick(0.25)(n), pick(0.5)(n), pick(0.75)(n)),
          labelsOfN = Some((n: org.apache.spark.sql.Column) => Seq(
            pick(0.25)(n) -> lit("p25"),
            pick(0.5)(n) -> lit("p50"),
            pick(0.75)(n) -> lit("p75"))))
        sel.select($"label".as("quartile"), $"v".as("price"))
          .orderBy($"quartile")
      },
      Some("""WITH r AS (
                SELECT o_totalprice AS v,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER () AS n
                FROM orders)
              SELECT CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN 'p25'
                          WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN 'p50'
                          ELSE 'p75' END AS quartile,
                     v AS price
              FROM r
              WHERE rn IN (CAST(ceil(0.25 * n) AS BIGINT),
                           CAST(ceil(0.5 * n) AS BIGINT),
                           CAST(ceil(0.75 * n) AS BIGINT))
              ORDER BY quartile""")),

    // Pearson correlation from exact decimal moments (dask df.corr):
    // every sum is order-free; the final formula is pure IEEE double.
    GQuery("corr",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sx"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double").as("sy"),
            sum(($"l_quantity" * $"l_quantity").cast(DecimalType(18, 2))).cast("double").as("sxx"),
            sum(($"l_extendedprice" * $"l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("syy"),
            sum(($"l_quantity" * $"l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sxy"))
          .select((($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy")))
            .as("corr_qty_price"))
      },
      Some("""WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
                  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
                FROM lineitem)
              SELECT (n * sxy - sx * sy) /
                     (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
              FROM m""")),

    // Per-group ordinary least squares (pandas groupby.apply(polyfit)
    // / dask's per-partition regression idiom), from the SAME exact
    // decimal moments as `corr`: one partial+final aggregate per group
    // carries five order-free sums; slope/intercept are a fixed-order
    // IEEE formula over those exact doubles, so both engines produce
    // bit-identical results. One shuffle keyed by group, O(1) state —
    // the canonical "sufficient statistics, not data movement" shape
    // for fitting millions of per-key models at 100 TB.
    GQuery("groupby_linreg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sx"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double").as("sy"),
            sum(($"l_quantity" * $"l_quantity").cast(DecimalType(18, 2))).cast("double").as("sxx"),
            sum(($"l_quantity" * $"l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sxy"))
          .withColumn("slope",
            ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"))
          .withColumn("intercept", ($"sy" - $"slope" * $"sx") / $"n")
          .select($"l_returnflag", $"n".cast("long").as("n_rows"),
            $"slope", $"intercept")
          .orderBy($"l_returnflag")
      },
      Some("""WITH m AS (
                SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
                FROM lineitem GROUP BY l_returnflag),
              k AS (
                SELECT l_returnflag, n, sx, sy,
                  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
                FROM m)
              SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, slope,
                     (sy - slope * sx) / n AS intercept
              FROM k ORDER BY l_returnflag""")),

    // pandas/dask pivot_table: long→wide with an explicit value list
    // (plan-time columns — REQUIRED at scale: an unpinned pivot runs a
    // distinct-scan job first and breaks on unbounded cardinality).
    GQuery("pivot",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .filter($"user_id" < 50)
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "view", "purchase"))
          .agg(Det.dsum($"value"))
          .orderBy($"user_id")
      },
      Some(s"""SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
              CAST(SUM(CASE WHEN event_type = 'view'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
              CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase
              FROM events WHERE user_id < 50
              GROUP BY user_id ORDER BY user_id""")),

    // pandas melt / dask melt: wide→long via Spark's native unpivot
    // (a Generator — per-row expansion, no shuffle).
    GQuery("melt",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_orderkey" < 100)
          .select($"o_orderkey", $"o_custkey".cast("double").as("o_custkey"),
            $"o_totalprice")
          .unpivot(Array($"o_orderkey"),
            Array($"o_custkey", $"o_totalprice"), "var", "val")
          .orderBy($"o_orderkey", $"var")
      },
      Some("""SELECT o_orderkey, var, val FROM (
                SELECT o_orderkey, 'o_custkey' AS var,
                  CAST(o_custkey AS DOUBLE) AS val
                FROM orders WHERE o_orderkey < 100
                UNION ALL
                SELECT o_orderkey, 'o_totalprice' AS var, o_totalprice AS val
                FROM orders WHERE o_orderkey < 100) t
              ORDER BY o_orderkey, var""")),

    // Full pandas describe() parity: moments + exact p25/p50/p75, the
    // quantiles via the same distributed rank selection as `quartiles`
    // (composes in one plan — no driver action).
    GQuery("describe_quantiles",
      (s, dir) => {
        import s.implicits._
        def pick(q: Double)(n: org.apache.spark.sql.Column) =
          ceil(lit(q) * n).cast("long")
        val quart = graft.ops.DistributedSelect.atRanks(
            Tables(s, dir, "orders").select($"o_totalprice", $"o_orderkey"),
            "o_totalprice", "o_orderkey",
            n => Seq(pick(0.25)(n), pick(0.5)(n), pick(0.75)(n)),
            labelsOfN = Some((n: org.apache.spark.sql.Column) => Seq(
              pick(0.25)(n) -> lit("p25"),
              pick(0.5)(n) -> lit("p50"),
              pick(0.75)(n) -> lit("p75"))))
          .agg(max(when($"label" === "p25", $"v")).as("p25"),
               max(when($"label" === "p50", $"v")).as("p50"),
               max(when($"label" === "p75", $"v")).as("p75"))
        val m = Tables(s, dir, "orders")
          .agg(
            count($"o_totalprice").as("n"),
            sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("s1"),
            sum(($"o_totalprice" * $"o_totalprice").cast(DecimalType(18, 4)))
              .cast("double").as("s2"),
            min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price"))
        m.crossJoin(quart)
          .select($"n", ($"s1" / $"n").as("mean_price"),
            sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("std_price"),
            $"min_price", $"p25", $"p50", $"p75", $"max_price")
      },
      Some("""WITH r AS (
                SELECT o_totalprice AS v,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER () AS n
                FROM orders),
              q AS (
                SELECT
                  MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25,
                  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
                  MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75
                FROM r),
              m AS (
                SELECT COUNT(o_totalprice) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s2,
                  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
                FROM orders)
              SELECT n, s1 / n AS mean_price,
                sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_price,
                min_price, p25, p50, p75, max_price
              FROM m, q""")),

    // pandas groupby().agg(list): per-group value collection. Collection
    // order is execution-dependent, so the graded form sorts the array and
    // serializes it to a comma-joined STRING — the grading comparator can't
    // hash ARRAY cells, and a canonical string is the same information.
    GQuery("agg_collect",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_custkey" < 30)
          .groupBy($"o_custkey")
          .agg(concat_ws(",", sort_array(collect_list($"o_orderkey"))
            .cast("array<string>")).as("orderkeys"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey,
                array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
              FROM orders WHERE o_custkey < 30
              GROUP BY o_custkey ORDER BY o_custkey""")),

    // pandas groupby().nunique(): distinct counts per group.
    GQuery("groupby_nunique",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy($"user_id")
          .agg(countDistinct($"event_type").as("n_types"),
               count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
                COUNT(*) AS n_events
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Sample covariance from exact decimal moments (pandas df.cov),
    // same order-free construction as corr.
    GQuery("cov",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sx"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double").as("sy"),
            sum(($"l_quantity" * $"l_extendedprice").cast(DecimalType(18, 2)))
              .cast("double").as("sxy"))
          .select((($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - lit(1.0)))
            .as("cov_qty_price"))
      },
      Some("""WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
                FROM lineitem)
              SELECT (sxy - sx * sy / n) / (n - 1.0) AS cov_qty_price FROM m""")),

    GQuery("cube",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("sum_qty"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ${Det.sql.dsum("l_quantity")} AS sum_qty
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    GQuery("rollup",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    GQuery("grouping_sets",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                  FROM orders_gs
                  GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
                  ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
              ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // dask groupby().quantile(): exact per-group p25/50/75 by rank.
    // Per-KEY windows here (state is per-key, never global): each group
    // sorts independently under its own hash partition, so the plan
    // scales with the largest GROUP, not the table. (A group so hot it
    // breaks a single window task would compose DistributedSelect per
    // key — not needed for grouping-key cardinalities like status.)
    GQuery("groupby_quantiles",
      (s, dir) => {
        import s.implicits._
        def pick(q: Double)(n: org.apache.spark.sql.Column) =
          ceil(lit(q) * n).cast("long")
        val order = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice", $"o_orderkey")
        val whole = Window.partitionBy($"o_orderstatus")
        Tables(s, dir, "orders")
          .select($"o_orderstatus", $"o_totalprice", $"o_orderkey")
          .withColumn("rn", row_number().over(order))
          .withColumn("n", count(lit(1)).over(whole))
          .filter($"rn" === pick(0.25)($"n") || $"rn" === pick(0.5)($"n") ||
            $"rn" === pick(0.75)($"n"))
          .groupBy($"o_orderstatus")
          .agg(
            max(when($"rn" === pick(0.25)($"n"), $"o_totalprice")).as("p25"),
            max(when($"rn" === pick(0.5)($"n"), $"o_totalprice")).as("p50"),
            max(when($"rn" === pick(0.75)($"n"), $"o_totalprice")).as("p75"))
          .orderBy($"o_orderstatus")
      },
      Some("""WITH r AS (
                SELECT o_orderstatus, o_totalprice AS v,
                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
                FROM orders)
              SELECT o_orderstatus,
                MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25,
                MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
                MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75
              FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Per-group distinct-value collection through the two-level
    // tree-reduce (dask split_every; graft.ops.HighCardAgg) so no
    // single partial state ever holds a whole group's set. Graded as a
    // sorted comma-joined string (same encoding as agg_collect — the
    // comparator can't hash ARRAY cells).
    GQuery("groupby_collect_distinct",
      (s, dir) => {
        import s.implicits._
        graft.ops.HighCardAgg.collectDistinctTree(
            Tables(s, dir, "events").select($"user_id", $"event_type"),
            Seq("user_id"), "event_type")
          .select($"user_id",
            concat_ws(",", $"event_type_set").as("types"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
                array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // pandas df.corr(): full pairwise Pearson matrix over the numeric
    // columns — computed from ONE scan. All sufficient statistics ride
    // a single map-side-combined global aggregate, then the 6
    // correlations are a driver-free projection over that one row
    // (explode of a literal struct array). The naive per-pair approach
    // is C(4,2)=6 scans of the fact table; at 100 TB that is 6 reads of
    // 100 TB vs one. Correlation is scale-invariant and the data is
    // 2-dp, so everything runs in INTEGER space w = 100·value (the
    // groupby_skew_kurt moments-sketch trick): per-row products are
    // int64-exact, and the product sums — which pass 2⁶³ at the ×100
    // decade — are summed as exactly-representable hi/lo halves (split
    // at 2²⁶: lo-sums ≤ 2²⁶·N, hi-sums ≤ 2²¹·N, both long-exact to
    // N ≈ 10⁹ rows) and reconstructed with one identical IEEE
    // multiply-add on both engines. 25 codegen'd LONG sums — the first
    // cut used DECIMAL(30,6) sums, whose non-compact (>18-digit)
    // BigDecimal path benched 85 s at sf1 vs ~6 s for this shape.
    GQuery("corr_matrix",
      (s, dir) => {
        import s.implicits._
        val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
          "l_discount" -> "d", "l_tax" -> "t")
        val lo26 = lit((1L << 26) - 1)
        val w = Tables(s, dir, "lineitem").select(
          cols.map { case (c, a) =>
            (col(c).cast(DecimalType(12, 2)) * 100).cast("long").as(s"w_$a")
          }: _*)
        val stats = Seq(count(lit(1)).cast("double").as("n")) ++
          cols.map { case (_, a) => sum(col(s"w_$a")).cast("double").as(s"s_$a") } ++
          (for { i <- cols.indices; j <- i until cols.size
                 ai = cols(i)._2; aj = cols(j)._2
                 c <- {
                   val p = col(s"w_$ai") * col(s"w_$aj")
                   Seq(sum(shiftright(p, 26)).cast("double").as(s"hi_$ai$aj"),
                     sum(p.bitwiseAND(lo26)).cast("double").as(s"lo_$ai$aj"))
                 } } yield c)
        val m = w.agg(stats.head, stats.tail: _*)
        def sij(ai: String, aj: String) =
          col(s"hi_$ai$aj") * 67108864.0 + col(s"lo_$ai$aj")
        val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
          val (ci, ai) = cols(i); val (cj, aj) = cols(j)
          struct(lit(ci).as("x_col"), lit(cj).as("y_col"),
            ((col("n") * sij(ai, aj) - col(s"s_$ai") * col(s"s_$aj")) /
              (sqrt(col("n") * sij(ai, ai) - col(s"s_$ai") * col(s"s_$ai")) *
                sqrt(col("n") * sij(aj, aj) - col(s"s_$aj") * col(s"s_$aj"))))
              .as("corr"))
        }
        m.select(explode(array(pairs: _*)).as("r"))
          .select($"r.x_col", $"r.y_col", $"r.corr")
          .orderBy($"x_col", $"y_col")
      },
      Some {
        val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
          "l_discount" -> "d", "l_tax" -> "t")
        val wdefs = cols.map { case (c, a) =>
          s"CAST(CAST($c AS DECIMAL(12,2)) * 100 AS BIGINT) AS w_$a"
        }.mkString(",\n                       ")
        val sums = (cols.map { case (_, a) =>
          s"CAST(CAST(SUM(w_$a) AS BIGINT) AS DOUBLE) AS s_$a" } ++
          (for { i <- cols.indices; j <- i until cols.size
                 ai = cols(i)._2; aj = cols(j)._2
                 f <- Seq(
                   s"CAST(CAST(SUM((w_$ai * w_$aj) >> 26) AS BIGINT) AS DOUBLE) AS hi_$ai$aj",
                   s"CAST(CAST(SUM((w_$ai * w_$aj) & 67108863) AS BIGINT) AS DOUBLE) AS lo_$ai$aj")
               } yield f)).mkString(",\n                  ")
        def sij(ai: String, aj: String) =
          s"(hi_$ai$aj * 67108864.0 + lo_$ai$aj)"
        val rows = (for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
          val (ci, ai) = cols(i); val (cj, aj) = cols(j)
          s"""SELECT '$ci' AS x_col, '$cj' AS y_col,
                 (n * ${sij(ai, aj)} - s_$ai * s_$aj) /
                 (sqrt(n * ${sij(ai, ai)} - s_$ai * s_$ai) *
                  sqrt(n * ${sij(aj, aj)} - s_$aj * s_$aj)) AS corr FROM m"""
        }).mkString("\n              UNION ALL\n              ")
        s"""WITH w AS (SELECT $wdefs
                       FROM lineitem),
              m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  $sums
                FROM w)
              $rows
              ORDER BY x_col, y_col"""
      }),

    // dask custom Aggregation(chunk, agg, finalize) analogue: typed
    // Aggregator with exact-decimal buffer (see graft.ops.WeightedMean).
    GQuery("agg_custom",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(WeightedMean.udafCol($"l_extendedprice", $"l_quantity").as("wavg_price"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
              CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // INCREMENTAL MATERIALIZED VIEW (round 15): the serving-layer
    // aggregate maintained from the CHANGE DATA FEED with partial
    // recompute — refresh cost ∝ changes + affected groups, never the
    // corpus. The key stresses every maintenance path at once: updates
    // that keep their group, updates that MOVE rows between groups
    // (preimage group must also refresh — resolved via a key-pruned
    // snapshot scan), inserts into existing groups, new keys, and
    // row-level deletes — AND (round 16) a COMPACTION between the
    // merge and the delete, so the refresh window SPANS a fold: the
    // feed diffs through it via the version log's fold marker instead
    // of forcing a full-corpus fullRefresh (round 15's weak mark).
    // Then ONE refresh, and the VIEW is hashed against a from-scratch
    // SQL aggregate of the final state — any stale, doubled, or
    // orphaned group diverges it.
    GQuery("mv_incremental",
      (s, dir) => {
        import s.implicits._
        import graft.ops.{AtomicPublish, MergeInto, MaterializedView}
        val src = graft.engine.Scratch.dir("mv_src_customer")
        val mv = graft.engine.Scratch.dir("mv_cust_nation")
        val cust = Tables(s, dir, "customer")
        AtomicPublish.publish(s, src)(p => cust.write.parquet(p))
        MaterializedView.create(s, mv, src,
          keys = Seq("c_custkey"), groupCols = Seq("c_nationkey"),
          aggs = Seq(
            MaterializedView.AggSpec("n_cust", "COUNT(*)"),
            MaterializedView.AggSpec("sum_bal",
              graft.engine.Det.sql.dsum("c_acctbal"))))
        val updates = cust.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", $"c_acctbal" + 100.0)
        val movers = cust.filter($"c_custkey" % 50 === 7)
          .withColumn("c_nationkey", ($"c_nationkey" + 1) % 25)
        val inserts = cust.filter($"c_custkey" % 97 === 0)
          .withColumn("c_custkey", $"c_custkey" + 5000000000L)
        MergeInto.upsertInto(s, src,
          updates.unionByName(movers).unionByName(inserts), Seq("c_custkey"))
        // fold mid-window: content-preserving, so the oracle is
        // unchanged — but the un-refreshed view must now diff THROUGH
        // this commit (pre-round-16: loud refusal → fullRefresh)
        MergeInto.compactMerged(s, src)
        MergeInto.deleteFrom(s, src,
          cust.filter($"c_custkey" % 13 === 5), Seq("c_custkey"))
        val st = MaterializedView.refresh(s, mv)
        // window = upsert + fold + delete (3 commits), one refresh
        require(st.fromVersion + 3 == st.toVersion && st.affectedGroups > 0,
          s"mv_incremental must refresh across the fold window: $st")
        MaterializedView.read(s, mv)
          .select($"c_nationkey", $"n_cust", $"sum_bal")
          .orderBy($"c_nationkey")
      },
      Some(s"""WITH src AS (
                SELECT c_custkey, c_nationkey, c_acctbal + 100.0 AS c_acctbal
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey, (c_nationkey + 1) % 25, c_acctbal
                FROM customer WHERE c_custkey % 50 = 7
                UNION ALL
                SELECT c_custkey + 5000000000, c_nationkey, c_acctbal
                FROM customer WHERE c_custkey % 97 = 0),
              merged AS (
                SELECT c_custkey, c_nationkey, c_acctbal FROM customer t
                WHERE NOT EXISTS
                  (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey)
                UNION ALL
                SELECT c_custkey, c_nationkey, c_acctbal FROM src),
              final AS (
                SELECT * FROM merged WHERE c_custkey NOT IN
                  (SELECT c_custkey FROM customer WHERE c_custkey % 13 = 5))
              SELECT c_nationkey, COUNT(*) AS n_cust,
                     ${graft.engine.Det.sql.dsum("c_acctbal")} AS sum_bal
              FROM final GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // STAR-SCHEMA incremental MV (round 16): the reporting shape that
    // justifies MVs aggregates over a JOIN — fact GROUP BY dim-derived
    // columns. The view is orders ⋈ customer grouped by c_mktsegment;
    // fact changes stress every star path at once: in-group price
    // updates, FK MOVES (o_custkey changes → the order's GROUP is a
    // different customer's segment — both segments must refresh),
    // inserts, and row-level deletes — then ONE refresh, hashed
    // against a from-scratch SQL aggregate of the joined final state.
    // Dims are snapshot inputs (broadcast at each refresh, pinned by
    // the computation) — a dim edit needs fullRefresh, the standard
    // star-MV boundary, documented in JoinSpec. Cost: refresh ∝ fact
    // changes + affected segments' fact slices, each joined against a
    // BROADCAST dim — never a shuffle of either table.
    GQuery("mv_join_incremental",
      (s, dir) => {
        import s.implicits._
        import graft.ops.{AtomicPublish, MergeInto, MaterializedView}
        import graft.ops.MaterializedView.JoinSpec
        val fact = graft.engine.Scratch.dir("mvj_orders")
        val dim = graft.engine.Scratch.dir("mvj_customer")
        val mv = graft.engine.Scratch.dir("mvj_seg_view")
        val orders = Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        val cust = Tables(s, dir, "customer")
          .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
        AtomicPublish.publish(s, fact)(p => orders.write.parquet(p))
        AtomicPublish.publish(s, dim)(p => cust.write.parquet(p))
        MaterializedView.create(s, mv, fact,
          keys = Seq("o_orderkey"), groupCols = Seq("c_mktsegment"),
          aggs = Seq(
            MaterializedView.AggSpec("n_orders", "COUNT(*)"),
            MaterializedView.AggSpec("sum_price",
              graft.engine.Det.sql.dsum("o_totalprice"))),
          joins = Seq(JoinSpec(dim, Seq("o_custkey"))))
        val updates = orders.filter($"o_orderkey" % 10 === 3)
          .withColumn("o_totalprice", $"o_totalprice" + 100.0)
        val movers = orders.filter($"o_orderkey" % 50 === 7)
          .withColumn("o_custkey", ($"o_custkey" % 100) + 1)
        val inserts = orders.filter($"o_orderkey" % 97 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 5000000000L)
        MergeInto.upsertInto(s, fact,
          updates.unionByName(movers).unionByName(inserts),
          Seq("o_orderkey"))
        MergeInto.deleteFrom(s, fact,
          orders.filter($"o_orderkey" % 13 === 5), Seq("o_orderkey"))
        val st = MaterializedView.refresh(s, mv)
        require(st.affectedGroups > 0, s"star refresh did no work: $st")
        MaterializedView.read(s, mv)
          .select($"c_mktsegment", $"n_orders", $"sum_price")
          .orderBy($"c_mktsegment")
      },
      Some(s"""WITH src AS (
                SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
                FROM orders WHERE o_orderkey % 10 = 3
                UNION ALL
                SELECT o_orderkey, (o_custkey % 100) + 1, o_totalprice
                FROM orders WHERE o_orderkey % 50 = 7
                UNION ALL
                SELECT o_orderkey + 5000000000, o_custkey, o_totalprice
                FROM orders WHERE o_orderkey % 97 = 0),
              merged AS (
                SELECT o_orderkey, o_custkey, o_totalprice FROM orders t
                WHERE NOT EXISTS
                  (SELECT 1 FROM src WHERE src.o_orderkey = t.o_orderkey)
                UNION ALL
                SELECT o_orderkey, o_custkey, o_totalprice FROM src),
              final AS (
                SELECT * FROM merged WHERE o_orderkey NOT IN
                  (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 = 5))
              SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                     ${graft.engine.Det.sql.dsum("o_totalprice")} AS sum_price
              FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""))
  )
}
