package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** §2.2 projection / filter / row ops, plus the flagship pricing
  * summary (TPC-H Q1 shape — the reference's core chunked
  * filter→groupby→agg loop, SURVEY.md §7 M0).
  */
object RelationalQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    // Flagship: scan → filter → hash-agg (partial/final) → sort.
    GQuery("q1_pricing_summary",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1999-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            Det.dsum($"l_quantity").as("sum_qty"),
            Det.dsum($"l_extendedprice").as("sum_base_price"),
            // price(2dec) * (1-disc)(2dec) is an exact 4-decimal value:
            // summing at scale 4 avoids the .xx5 tie-rounding divergence
            // between Java's exact and DuckDB's binary-double decimal cast.
            Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
            Det.davg($"l_quantity").as("avg_qty"),
            Det.davg($"l_extendedprice").as("avg_price"),
            Det.davg($"l_discount", 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              ${Det.sql.dsum("l_quantity")} AS sum_qty,
              ${Det.sql.dsum("l_extendedprice")} AS sum_base_price,
              ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
              ${Det.sql.davg("l_quantity")} AS avg_qty,
              ${Det.sql.davg("l_extendedprice")} AS avg_price,
              ${Det.sql.davg("l_discount", 4)} AS avg_disc,
              COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    GQuery("project",
      (s, dir) => Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")),

    GQuery("with_column",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .filter($"l_orderkey" < 100)
          .withColumn("charge",
            $"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .select("l_orderkey", "l_linenumber", "charge")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
              FROM lineitem WHERE l_orderkey < 100
              ORDER BY l_orderkey, l_linenumber""")),

    GQuery("filter",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .filter($"event_type" === "purchase" && $"value" > 50.0)
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value FROM events
              WHERE event_type = 'purchase' AND value > 50.0
              ORDER BY event_id""")),

    GQuery("map_rows",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .select($"c_custkey",
            concat(upper($"c_name"), lit("#"), $"c_nationkey".cast("string")).as("tag"),
            (abs($"c_acctbal") + lit(1.0)).as("absbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
              upper(c_name) || '#' || CAST(c_nationkey AS VARCHAR) AS tag,
              abs(c_acctbal) + 1.0 AS absbal
              FROM customer ORDER BY c_custkey""")),

    GQuery("dropna_fillna",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .withColumn("v", when($"value" < 10.0, lit(null)).otherwise($"value"))
          .na.fill(Map("v" -> -1.0))
          .filter($"event_type" =!= "error")
          .select("event_id", "v")
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
              COALESCE(CASE WHEN value < 10.0 THEN NULL ELSE value END, -1.0) AS v
              FROM events WHERE event_type <> 'error'
              ORDER BY event_id""")),

    GQuery("isin",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_orderpriority")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
              WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
              ORDER BY o_orderkey""")),

    GQuery("hash_columns",
      (s, dir) => {
        import s.implicits._
        // dataframe_hash_columns-style anonymization: truncated sha-256.
        Tables(s, dir, "customer")
          .select($"c_custkey",
            substring(sha2($"c_name", 256), 1, 16).as("name_hash"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, substr(sha256(c_name), 1, 16) AS name_hash
              FROM customer ORDER BY c_custkey""")),

    // Single-column series veneer (reference sdf["x"].sum() idiom):
    // astype→sum chain through graft.engine.SeriesFrame; decimal cast
    // makes the sum order-free (Det rule), double cast matches the
    // oracle's output type.
    GQuery("series_agg",
      (s, dir) => {
        import s.implicits._
        new graft.engine.StreamFrame(Tables(s, dir, "events"))("value")
          .astype("decimal(18,2)").sum()
          .select($"value_sum".cast("double").as("sum_value"))
      },
      Some(s"""SELECT ${Det.sql.dsum("value")} AS sum_value FROM events""")),

    GQuery("series_value_counts",
      (s, dir) => {
        new graft.engine.StreamFrame(Tables(s, dir, "events"))("event_type")
          .valueCounts()
      },
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              GROUP BY event_type ORDER BY n DESC, event_type""")),

    // Engine-specific RNG → no SQL oracle (rows-only); properties in ScalaTest.
    GQuery("sample",
      (s, dir) => Tables(s, dir, "lineitem")
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"),
      None),

    GQuery("shuffle_rows",
      (s, dir) => Tables(s, dir, "customer")
        .orderBy(rand(42L))
        .select("c_custkey"),
      None),

    // randomSplit-based train/test split: engine-specific RNG → rows-only;
    // disjointness/reproducibility are ScalaTest-gated.
    GQuery("train_test_split",
      (s, dir) => {
        import s.implicits._
        val (train, test) = graft.ops.Sampling.trainTestSplit(
          Tables(s, dir, "documents"), testFraction = 0.2, seed = 42L)
        train.select(lit("train").as("split"), $"doc_id")
          .unionByName(test.select(lit("test").as("split"), $"doc_id"))
          .groupBy($"split").agg(count(lit(1)).as("n"))
          .orderBy($"split")
      },
      None),

    // Deterministic content-hash sampling + stable split assignment:
    // a pure function of the data (partitioning/cluster independent),
    // but xxhash64 has no DuckDB analogue → rows-only.
    GQuery("sample_exact_n",
      (s, dir) => {
        import s.implicits._
        graft.ops.Sampling.hashSample(
            Tables(s, dir, "documents").select($"doc_id", $"text"),
            n = 100, salt = 7L, $"doc_id")
          .select($"doc_id")
          .orderBy($"doc_id")
      },
      None),

    // Deterministic distributed k-sample via the BottomKSample
    // TypedImperativeAggregate (order/partitioning-free; custom hash →
    // rows-only; partition invariance is ScalaTest-gated).
    GQuery("reservoir_sample",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .agg(graft.engine.GraftFunctions.bottomkSample(s, $"o_orderkey", 50, 7L).as("sample"))
          .select(explode($"sample").as("o_orderkey"))
          .orderBy($"o_orderkey")
      },
      None),

    // Leakage-free split: rows sharing a user stay in one split —
    // component-hash assignment is engine-specific → rows-only; the
    // no-leakage property itself is ScalaTest-gated (ConnexSplitSpec).
    GQuery("connex_split",
      (s, dir) => {
        import s.implicits._
        graft.ops.ConnexSplit.connexSplit(
            Tables(s, dir, "events").select($"event_id", $"user_id"),
            "event_id", Seq("user_id"), testPermille = 200, salt = 7L)
          .groupBy($"split").agg(count(lit(1)).as("n"))
          .orderBy($"split")
      },
      None),

    // Weight-balanced folds over user components (sorted round-robin);
    // fold assignment depends on the component hash → rows-only, the
    // balance property is ScalaTest-gated.
    GQuery("weighted_folds",
      (s, dir) => {
        import s.implicits._
        graft.ops.ConnexSplit.weightedFolds(
            Tables(s, dir, "events").select($"event_id", $"user_id"),
            "event_id", Seq("user_id"), k = 4, salt = 7L)
          .groupBy($"fold").agg(count(lit(1)).as("n"))
          .orderBy($"fold")
      },
      None),

    // Exact stratified split: per-(label, split) counts are a pure
    // function of the data — ceil(f·n_label) test rows per label — so
    // the aggregate IS oracle-checkable.
    GQuery("stratified_split",
      (s, dir) => {
        import s.implicits._
        graft.ops.ConnexSplit.stratifiedSplit(
            Tables(s, dir, "documents"), "lang", testFraction = 0.2,
            salt = 7L, $"doc_id")
          .groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"split")
      },
      Some("""SELECT lang, split, n FROM (
                SELECT lang, 'test' AS split,
                  CAST(ceil(0.2 * COUNT(*)) AS BIGINT) AS n
                FROM documents GROUP BY lang
                UNION ALL
                SELECT lang, 'train' AS split,
                  COUNT(*) - CAST(ceil(0.2 * COUNT(*)) AS BIGINT) AS n
                FROM documents GROUP BY lang) t
              ORDER BY lang, split""")),

    // Hash split — round 16 upgraded from rows-only to a hash-graded
    // VERDICT: the exact per-split counts are xxhash64-dependent
    // (DuckDB cannot reproduce them), but the properties that make a
    // split correct are assertable in-query against exact oracle
    // terms: partition completeness (train+test == corpus, no third
    // bucket) and the test fraction within ±5% absolute of the asked
    // 200‰ (xxhash64 is uniform; at the graded row counts the binomial
    // deviation is under 2%, and the split is deterministic per salt,
    // so the verdict is a constant of the dataset). The oracle asserts
    // the exact corpus total plus TRUE — a skewed hash, a dropped
    // bucket, or a row routed to both sides fails the hash, not just a
    // spec.
    GQuery("hash_split",
      (s, dir) => {
        import s.implicits._
        val split = graft.ops.Sampling.hashSplit(
          Tables(s, dir, "documents"), testPermille = 200, salt = 7L,
          $"doc_id")
        split.agg(
            count(lit(1)).as("n_total_raw"),
            count(when($"split" === "test", 1)).as("n_test"),
            count(when($"split" === "train", 1)).as("n_train"))
          .select($"n_total_raw".as("n_total"),
            ($"n_test" + $"n_train" === $"n_total_raw").as("partition_ok"),
            (abs($"n_test".cast("double") / $"n_total_raw" - lit(0.2))
              <= lit(0.05)).as("frac_ok"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
              TRUE AS partition_ok, TRUE AS frac_ok
              FROM documents""")),

    // Typed cogroup (KeyValueGroupedDataset.cogroup): the per-key
    // arbitrary-logic escape hatch the reference's chunked two-frame
    // apply maps onto when neither join nor agg expresses the
    // reconciliation. Plan shape: BOTH sides hash-shuffle once on the
    // key and stream through the user function as co-partitioned
    // sorted-group iterators — no materialized group lists, O(group)
    // state, arbitrary Scala per key. Determinism contract: only
    // order-free reductions inside the function (count, max), so the
    // result is exact regardless of iterator order.
    GQuery("cogroup_reconcile",
      (s, dir) => {
        import s.implicits._
        val custs = Tables(s, dir, "customer")
          .filter($"c_custkey" < 500)
          .select($"c_custkey", $"c_acctbal").as[(Long, Double)]
        val orders = Tables(s, dir, "orders")
          .select($"o_custkey", $"o_totalprice").as[(Long, Double)]
        custs.groupByKey(_._1).cogroup(orders.groupByKey(_._1)) {
          (k, cs, os) =>
            val cl = cs.toList
            if (cl.isEmpty) Iterator.empty
            else {
              var n = 0L
              var mx = Double.NaN
              os.foreach { o =>
                n += 1
                if (mx.isNaN || o._2 > mx) mx = o._2
              }
              Iterator((k, cl.head._2, n,
                if (n == 0) None else Some(mx)))
            }
        }.toDF("c_custkey", "acctbal", "n_orders", "max_order_price")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal AS acctbal,
                COUNT(o_orderkey) AS n_orders,
                MAX(o_totalprice) AS max_order_price
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              WHERE c_custkey < 500
              GROUP BY c_custkey, c_acctbal ORDER BY c_custkey"""))
  )
}
