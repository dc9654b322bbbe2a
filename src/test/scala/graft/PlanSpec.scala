package graft

import graft.queries.Registry

/** Physical-plan assertions: the scale properties the engine is built
  * around must be visible in `explain` output — filters reaching the
  * parquet scan, scans pruned to referenced columns, small dims
  * broadcast, top-k compiled to TakeOrderedAndProject. These are the
  * checks that keep a 100 TB run from silently degrading into
  * full-scan/shuffle plans.
  */
class PlanSpec extends SparkSpec {

  private def plan(key: String): String = {
    val df = Registry.byKey(key).build(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
  }

  test("q1: scan reads only the referenced columns") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"),
      s"column pruning failed: $readSchema")
  }

  test("join_broadcast uses BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q3 joins avoid nested-loop; top-10 is TakeOrderedAndProject") {
    val p = plan("q3_shipping_priority")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("top_k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("top_k").contains("TakeOrderedAndProject"))
  }

  test("head short-circuits: bare limit scans at most n rows, no sort below it") {
    import org.apache.spark.sql.functions.col
    val df = new graft.engine.StreamFrame(
      graft.engine.Tables(spark, sfDir, "lineitem")).head(5).toDF()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CollectLimit") || p.contains("GlobalLimit"),
      s"no limit operator:\n$p")
    assert(!p.contains("Sort "), s"head must not sort:\n$p")
  }

  test("filter query pushes predicates and prunes columns") {
    val p = plan("filter")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value)"),
      s"no pushed filters:\n$p")
  }

  test("stream_static_join broadcasts the dimension side") {
    assert(plan("stream_static_join").contains("BroadcastHashJoin"))
  }

  test("sim_search is a broadcast product (query side broadcast, no shuffle of base)") {
    val p = plan("sim_search")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast product:\n$p")
  }

  test("join_asof plans one key-shuffle window, not a nested loop") {
    val p = plan("join_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join degenerated:\n$p")
    assert(p.contains("Window"), s"no window operator:\n$p")
  }

  test("partial aggregation is map-side for groupby_agg") {
    val p = plan("groupby_agg")
    assert(p.contains("partial_"), s"no partial aggregate:\n$p")
  }

  test("groupby_highcard: the only hash exchange is the explicit split_out one") {
    val p = plan("groupby_highcard")
    // split_out shape: ONE explicit cluster-by-key exchange
    // (REPARTITION_BY_NUM); the aggregate must not add its own
    // ENSURE_REQUIREMENTS hash shuffle on top. (Spark still emits an
    // in-stage partial/final HashAggregate pair, but with no exchange
    // between them — no cross-network combine pass.)
    assert(p.contains("REPARTITION_BY_NUM"), s"no explicit repartition:\n$p")
    val ensures = "Exchange hashpartitioning[^\\n]*ENSURE_REQUIREMENTS".r
      .findAllIn(p).length
    assert(ensures === 0, s"aggregate added its own hash shuffle:\n$p")
  }

  test("bucketed join shuffles NEITHER side") {
    val df = Registry.byKey("join_bucketed").build(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the only exchanges allowed are AFTER the join (final agg/sort);
    // between the two bucketed scans and the join there must be none.
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0, s"no join in plan:\n$p")
    val belowJoin = p.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(p.contains("SelectedBucketsCount") || belowJoin.contains("Bucketed: true"),
      s"scan not bucketed:\n$p")
  }

  test("dedup_minhash: signatures never ride the band-collision exchange") {
    // The 100 TB shuffle-bytes term: the (band, bh) collision join must
    // move ONLY ids — est_jaccard is computed after deduping pairs and
    // fetching signatures back with plain equi-joins.
    import org.apache.spark.sql.execution.exchange.Exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Registry.byKey("dedup_minhash").build(spark, sfDir)
        .queryExecution.executedPlan
      val bandExchanges = plan.collect {
        case e: Exchange if e.output.exists(_.name == "bh") => e
      }
      assert(bandExchanges.nonEmpty, "no band-hash exchange in the plan")
      bandExchanges.foreach { e =>
        assert(!e.output.exists(_.name.startsWith("sig")),
          s"signatures ride the band shuffle: ${e.output.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_simhash plans band equi-joins, not an all-pairs nested loop") {
    val p = plan("dedup_simhash")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs scan in:\n$p")
  }

  test("embed_neardup dispatches by regime: broadcast-exact here, bucket joins for LSH") {
    // The graded cos >= 0.45 is degenerate for hyperplane LSH, so the
    // adaptive dispatcher takes the exact blocked path: a BROADCAST
    // nested-loop (one side shipped whole, the other streamed through
    // the fused cosine) — never an unbroadcast CartesianProduct.
    val p = plan("embed_neardup")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast product:\n$p")
    // The LSH regime (sane threshold, corpus-aware provisioning) must
    // still plan bucket equi-joins with no product of any kind.
    val emb = graft.engine.Tables(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("e"))
    val lsh = graft.ops.AnnSearch.neardupPairsAdaptive(spark, emb, "vec_id", "e",
        minCosine = 0.99, corpusSize = Some(100000L))
      .queryExecution.executedPlan.toString
    assert(!lsh.contains("BroadcastNestedLoopJoin") && !lsh.contains("CartesianProduct"),
      s"product in LSH path:\n$lsh")
  }

  test("median plans no driver action and no full-input global window") {
    val df = Registry.byKey("median").build(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the only window operators allowed sort the tiny bucket-stats frame
    // or the surviving buckets — never a single-partition sort of the
    // full input (the round-1 scale-killer); the scan side must feed a
    // hash aggregate, not a global Sort.
    assert(p.contains("HashAggregate"), s"no hash agg in:\n$p")
    assert(!p.contains("rangepartitioning(o_totalprice"),
      s"global sort of the full input:\n$p")
  }

  test("ntile_global ranks without a single-task global sort") {
    val p = plan("ntile_global")
    // the rank windows are per-bucket (hash-partitioned); a global sort
    // on the VALUE column would appear as rangepartitioning(o_totalprice…)
    assert(!p.contains("rangepartitioning(o_totalprice"),
      s"global value sort crept in:\n$p")
    assert(p.contains("Window"), s"no window:\n$p")
  }

  test("partitioned parquet readback prunes to the matching partition") {
    val df = Registry.byKey("sink_parquet_partitioned").build(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    // the partition filter must be applied at file-listing time, not as a row filter
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning:\n$scan")
  }

  test("range layout readback prunes partitions via divisions arithmetic") {
    val df = Registry.byKey("scan_range_pruned").build(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("__rp"), s"no partition filter on __rp:\n$p")
    // the id-range filter must carry BOTH bounds (lo and hi partition)
    assert(pf.contains(">=") && pf.contains("<="), s"unbounded partition filter: $pf")
  }

  test("no-partition windows only ever sort bucket-stat frames (<= buckets rows)") {
    // The DistributedSelect construction runs ONE window with no
    // partitionSpec — the cumulative-offset scan over the per-bucket
    // counts (<= 32 rows, ordered by the bucket id __b). Any other
    // no-partition window in a graded plan is a single-task funnel over
    // real data and must fail here loudly (e.g. ntile_global regressing
    // to row_number().over(Window.orderBy(value))).
    import org.apache.spark.sql.execution.window.WindowExec
    val keys = Seq("median", "quartiles", "describe_quantiles",
      "ntile_global", "groupby_quantiles", "weighted_folds", "concat_cols")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (k <- keys) {
        val plan = Registry.byKey(k).build(spark, sfDir).queryExecution.executedPlan
        val noPart = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        noPart.foreach { w =>
          val ord = w.orderSpec.map(_.child.toString).mkString(",")
          assert(ord.contains("__b") || ord.contains("__pid"),
            s"$k: no-partition window NOT over a bucket/partition-stats frame (order: $ord)")
        }
        if (k == "groupby_quantiles")
          assert(noPart.isEmpty, s"$k must use only per-key windows")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("concat_cols: row-number zip has no single-task window over the data") {
    // The round-7 verdict's last scale-killer shape: a positional zip
    // built on row_number().over(Window.orderBy(name)) — one task sorts
    // the whole frame. The rebased zip (withRangeRowNumber) may only run
    // no-partition windows over the <= numParts partition-counts frame
    // (ordered by __pid); the data-bearing windows must be keyed.
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Registry.byKey("concat_cols").build(spark, sfDir)
        .queryExecution.executedPlan
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "expected window operators in the zip plan")
      val bad = wins.filter(w => w.partitionSpec.isEmpty &&
        !w.orderSpec.map(_.child.toString).mkString(",").contains("__pid"))
      assert(bad.isEmpty,
        s"single-task window over data columns: ${bad.map(_.orderSpec).mkString}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("groupby_collect_distinct tree-reduces through two bounded levels") {
    val p = plan("groupby_collect_distinct")
    assert(p.contains("__salt"), s"no salt column (level-1 split missing):\n$p")
    // exactly two hash exchanges: cluster by (key, salt), then by key —
    // the final sort's range exchange is separate.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 2, s"expected 2 hash exchanges, got $hashEx:\n$p")
  }

  test("whole-stage codegen covers the q1 aggregation") {
    // AQE reports codegen spans only in the final (executed) plan.
    val df = Registry.byKey("q1_pricing_summary").build(spark, sfDir)
    df.collect()
    // codegen stages render as "*(n) Operator" in the final AQE plan
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("q5: dims broadcast, date filter pushed, no product joins") {
    val p = plan("q5_local_supplier")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"product join in:\n$p")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins, got $nBroadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed to orders scan:\n$p")
  }

  test("contamination_ngram broadcasts the benchmark gram set") {
    // The eval-suite side is tiny by nature; the corpus side must
    // stream through a broadcast hash join, never a shuffle of grams.
    assert(plan("contamination_ngram").contains("BroadcastHashJoin"))
  }

  test("ewm_mean evaluates all lag terms in a single window pass") {
    val n = "Window".r.findAllIn(plan("ewm_mean")).length
    assert(n === 1, s"expected one WindowExec, got $n")
  }

  test("rolling_median uses one per-key window, no global sort below it") {
    val p = plan("rolling_median")
    val n = "Window".r.findAllIn(p).length
    assert(n === 1, s"expected one WindowExec, got $n")
  }

  test("pii_redact scan is pruned to the referenced columns") {
    val readSchema = plan("pii_redact").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_name") && !readSchema.contains("c_acctbal"),
      s"column pruning failed: $readSchema")
  }

  test("repetition_stats is a pure projection — zero hash exchanges") {
    // A document's tokens live in one row, so the per-doc word stats
    // come from the codegen token_repetition_stats expression: no
    // explode, no groupBy — the only exchange left is the final
    // presentation orderBy (range partitioning).
    val p = plan("repetition_stats")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 0, s"expected 0 hash exchanges, got $hashEx:\n$p")
    assert(p.contains("token_repetition_stats"),
      s"expected the codegen expression in the plan:\n$p")
  }

  test("clip is a pure projection: pushed scan filter, zero hash exchanges") {
    val p = plan("clip")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey"),
      s"no pushed filter:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("mode: the rank window runs on the aggregated pairs frame, not the data") {
    // One map-side-combined count per (flag, status) collapses the
    // table BEFORE the tie-break window — partial_count must appear,
    // and the only hash exchanges are the agg's and the window's
    // (both over the tiny distinct-pairs frame).
    val p = plan("mode")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side combine:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx:\n$p")
  }

  test("groupby_idxmax is one map-side-combined aggregation, no window") {
    val p = plan("groupby_idxmax")
    assert(p.contains("partial_max_by") || p.contains("partial_max"),
      s"no partial agg:\n$p")
    assert(!p.contains("Window"), s"idxmax must not window the data:\n$p")
  }

  test("tfidf_topk: term counts combine map-side before every exchange") {
    val p = plan("tfidf_topk")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 4, s"expected <=4 hash exchanges, got $hashEx:\n$p")
  }

  test("contamination_ngram shuffles only post-join rows, never the gram stream") {
    // ngram_hashes dedups grams map-side; the corpus gram stream goes
    // explode → broadcast join (no exchange). Hash exchanges left:
    // the bench-side distinct (tiny) and the per-doc count over
    // CONTAMINATED rows only.
    val p = plan("contamination_ngram")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx:\n$p")
    assert(p.contains("ngram_hashes"),
      s"expected the codegen expression in the plan:\n$p")
  }

  test("chunk_split is a pure map: zero hash exchanges before the output sort") {
    val p = plan("chunk_split")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 0, s"chunking must not shuffle:\n$p")
    // the only exchange is the rangepartitioning for the final ORDER BY
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(rangeEx === 1, s"expected exactly the output sort exchange:\n$p")
  }

  test("chunk_dedup: the chunk stream shuffles once, scan pruned to text+id") {
    val p = plan("chunk_dedup")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("lang"),
      s"column pruning failed: $readSchema")
    // count-distinct expands the agg into two phases; the chunk stream
    // itself must cross at most those two keyed exchanges
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx:\n$p")
  }

  test("qcut: boundary frame broadcasts; no driver-side collect in the plan") {
    val p = plan("qcut")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"boundaries must broadcast:\n$p")
  }

  test("char_stats is a pure projection: zero hash exchanges, scan pruned") {
    // The per-row char histogram (array HOFs) never leaves the task —
    // the embarrassingly-parallel shape that holds at 100 TB. Only the
    // output ORDER BY may exchange.
    val p = plan("char_stats")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 0, s"char_stats must not shuffle:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("lang"),
      s"column pruning failed: $readSchema")
  }

  test("groupby_skew_kurt is one map-side-combined aggregation (moments sketch)") {
    val p = plan("groupby_skew_kurt")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1, s"expected the single group-key exchange, got $hashEx:\n$p")
    assert(p.contains("partial"), s"no map-side partial aggregation in:\n$p")
  }

  test("outlier_zscore: stats join is broadcast, fact side never re-shuffles") {
    val p = plan("outlier_zscore")
    assert(p.contains("BroadcastHashJoin"), s"stats must broadcast:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1, s"only the stats aggregation may hash-exchange, got $hashEx:\n$p")
  }

  test("q7: both dim sides broadcast below the single fact-fact shuffle join") {
    val p = plan("q7_volume_shipping")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"product join in:\n$p")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins, got $nBroadcast:\n$p")
    assert(p.contains("SortMergeJoin") || "ShuffledHashJoin".r.findAllIn(p).nonEmpty,
      s"expected one shuffled fact-fact join:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to lineitem scan:\n$p")
  }

  test("stream_topk buckets via date_trunc, not a per-row window struct") {
    val p = plan("stream_topk")
    assert(p.contains("date_trunc"), s"expected date_trunc bucketing:\n$p")
    assert(!p.toLowerCase.contains("named_struct"),
      s"window-struct allocation survived the date_trunc rework:\n$p")
  }

  test("rolling_quantile uses one per-key window, no global sort below it") {
    val n = "Window".r.findAllIn(plan("rolling_quantile")).length
    assert(n === 1, s"expected one WindowExec, got $n")
  }

  test("groupby_cumcount is a single window pass over one key shuffle") {
    val p = plan("groupby_cumcount")
    val n = "Window".r.findAllIn(p).length
    assert(n === 1, s"expected one WindowExec, got $n")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1, s"expected exactly the key shuffle, got $hashEx:\n$p")
  }

  test("corr_matrix: all 15 sufficient statistics ride ONE scan and one global agg") {
    val p = plan("corr_matrix")
    // a naive per-pair implementation scans the fact table 6 times;
    // the one-pass shape has exactly one parquet scan and no hash
    // exchange (global agg exchanges to a single partition only).
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected one scan, got $scans:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 0, s"expected no hash exchange, got $hashEx:\n$p")
    assert(p.contains("partial"), s"no map-side partial aggregation:\n$p")
  }

  test("factorize: code window runs on the dictionary; fact side broadcast-joins") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Registry.byKey("factorize").build(spark, sfDir)
        .queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"dictionary must broadcast back onto the fact table:\n$plan")
      // the only no-partition window sorts the post-distinct dictionary
      // (its input comes from a HashAggregate, never the raw scan)
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "expected the code-assignment window")
      wins.foreach { w =>
        assert(w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
        }.nonEmpty, s"code window not over the distinct dictionary:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ngram_oov_ratio: vocab is a top-K heap merge; membership joins broadcast") {
    val p = plan("ngram_oov_ratio")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary must be TakeOrderedAndProject, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
  }

  test("kmeans_assign: centroids broadcast; corpus side never cartesians unbroadcast") {
    val p = plan("kmeans_assign")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast centroid product:\n$p")
    // assignment itself is zero-shuffle: the ONLY hash exchanges are the
    // two levels of the (cluster × dim) centroid aggregation.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, s"assignment added shuffles, got $hashEx:\n$p")
  }

  test("kmeans_lloyd: per-iteration shuffles are only the centroid aggregations") {
    val p = plan("kmeans_lloyd")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
    // two iterations × two centroid agg levels; the assignment passes
    // contribute none.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 4, s"assignment passes added shuffles, got $hashEx:\n$p")
  }

  test("bm25_topk: stats broadcast back; top-10 is TakeOrderedAndProject") {
    val p = plan("bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"per-term stats must broadcast:\n$p")
  }

  test("dedup_cross_exact: eval hashes broadcast; train side never shuffles") {
    val p = plan("dedup_cross_exact")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"train side must stream through, got $hashEx:\n$p")
  }

  test("stream_dedup_ttl: one key shuffle, a sorted scan, no window/iteration") {
    val p = plan("stream_dedup_ttl")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1, s"expected exactly the key repartition, got $hashEx:\n$p")
    assert(!p.contains("Window"), s"chain dedup must not window:\n$p")
  }

  test("scan_bucket_pruned reads a strict subset of the buckets") {
    val p = plan("scan_bucket_pruned")
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
    assert(m.nonEmpty, s"no bucket pruning in:\n$p")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"IN-list did not prune any bucket: ${m.get.matched}")
  }

  test("scan_zorder_pruned: cell IN-list lands in PartitionFilters") {
    val p = plan("scan_zorder_pruned")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("__zb"),
      s"z-cell pruning must be a partition (listing-time) filter:\n$p")
    // Residual x/y predicates still push to the parquet row groups.
    assert(p.contains("PushedFilters") && p.contains("o_totalprice"),
      s"in-cell min/max pruning lost:\n$p")
  }

  test("q10: bloom probe filters lineitem BELOW its exchange; top-20 is TakeOrderedAndProject") {
    val p = plan("q10_returned_item")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    // The bloom probe must sit on the scan side of lineitem's hash
    // exchange: in the plan string the probe expression (bloom_might_
    // contain over xxhash64) appears in a Filter whose subtree contains
    // the lineitem FileScan, before any Exchange above it.
    val probeIdx = p.indexOf("GraftBloomMightContain")
    val anyProbe = if (probeIdx < 0) p.indexOf("bloom") else probeIdx
    assert(anyProbe >= 0, s"no bloom probe in q10 plan:\n$p")
    assert(p.contains("l_returnflag"), s"returnflag filter lost:\n$p")
  }

  test("contamination_embed broadcasts the eval slice, never shuffles the train side") {
    val p = plan("contamination_embed")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"eval slice must broadcast:\n$p")
    // The only hash exchange allowed is the per-vec window over HITS
    // (threshold-filtered, tiny) — never the full train corpus before
    // the cosine filter. Assert the cross join input has no Exchange
    // between the embeddings scan and the join.
    val joinIdx = p.indexOf("BroadcastNestedLoopJoin")
    if (joinIdx >= 0) {
      val below = p.substring(joinIdx)
      val scanIdx = below.indexOf("FileScan")
      val exIdx = below.indexOf("Exchange hashpartitioning")
      assert(scanIdx >= 0 && (exIdx < 0 || exIdx > scanIdx),
        s"train side shuffled before the cosine filter:\n$p")
    }
  }

  test("bigram_pmi shuffles vocabulary-sized tables, not the corpus") {
    val p = plan("bigram_pmi")
    // Partial (map-side) aggregation must combine bigram counts before
    // the exchange, and the final ranking is a bounded top-20.
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"no map-side combine for bigram counts:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
  }

  test("groupby_linreg is one partial+final aggregate, no second pass") {
    val p = plan("groupby_linreg")
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nEx === 1, s"expected exactly one key exchange, got $nEx:\n$p")
  }

  test("blocked SemDeDup pair generation is ONE cell-keyed exchange, no joins") {
    // The kmeans-blocked scale path's whole shuffle budget: assignment
    // is a codegen projection, pair enumeration is partition-local —
    // the only exchange in the plan is the explicit repartition by
    // cell. No join, no pair-dedup agg anywhere.
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = graft.engine.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val n = emb.count()
      val pairs = graft.ops.SemDedup.blockedPairs(spark, emb, "vec_id", "e",
        minCosine = 0.45, dim = 64, n = n, cacheKey = Some("planspec"))
      val p = pairs.queryExecution.executedPlan.toString
      val nEx = "Exchange ".r.findAllIn(p).length
      assert(nEx === 1, s"expected exactly one exchange, got $nEx:\n$p")
      assert(!p.contains("Join"), s"unexpected join in the blocked path:\n$p")
      assert(!p.toLowerCase.contains("aggregate"),
        s"unexpected aggregate (pair dedup crept back?):\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("scan_manifest_pruned: zonemaps drop whole segments' files from the scan") {
    // Build the key's published table (3 date-range segments); the key
    // itself hash-grades that pruning never changes RESULTS — this pins
    // that pruning actually HAPPENS: the date predicate must shrink the
    // scan's file list (zonemap sidecars consulted in listFiles), since
    // plain InMemoryFileIndex ignores data filters entirely, any
    // file-count reduction here is segment pruning.
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    Registry.byKey("scan_manifest_pruned").build(spark, sfDir).collect()
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec =>
        b.inputPartitions.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
      }.sum
    val all = spark.sql("SELECT o_orderkey FROM graft_zone_orders")
    val pruned = spark.sql(
      """SELECT o_orderkey FROM graft_zone_orders
         WHERE o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'""")
    val (fAll, fPruned) = (files(all), files(pruned))
    assert(fAll > 0, "unfiltered scan lists no files?")
    assert(fPruned > 0, "pruned scan must still read the matching segment")
    assert(fPruned < fAll,
      s"zonemap pruning did not drop files: $fPruned of $fAll")
    // both non-matching segments must be gone wholesale, not one file
    assert(fPruned <= fAll - 2,
      s"expected at least the two non-matching segments pruned: $fPruned of $fAll")
  }

  test("point lookup under PENDING merges prunes segments (readOver zonemaps)") {
    // Round-15 gap: the pruning index lived only in the DSv2 source,
    // which refuses tables with pending upserts — so a point lookup on
    // an actively-merged table scanned every segment until a fold
    // landed. readOver's scans now consult the same sidecars: the key
    // predicate must shrink BOTH the data side's and the claims side's
    // file lists, while the reconciled RESULT stays exact.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.ops.{AtomicPublish, MergeInto}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val table = graft.engine.Scratch.dir("spec_mor_prune")
      val cust = graft.engine.Tables(spark, sfDir, "customer")
      AtomicPublish.publish(spark, table)(p =>
        cust.filter(col("c_custkey") < 400).write.parquet(p))
      AtomicPublish.appendSegment(spark, table)(p =>
        cust.filter(col("c_custkey") >= 400 && col("c_custkey") < 800)
          .write.parquet(p))
      AtomicPublish.appendSegment(spark, table)(p =>
        cust.filter(col("c_custkey") >= 800).write.parquet(p))
      MergeInto.upsertInto(spark, table,
        cust.filter(col("c_custkey") === 10)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0),
        Seq("c_custkey"))
      // the merge is PENDING (auto-fold fires at 16 segments, we have 4)
      assert(AtomicPublish.upsertSidecarsFor(spark, table,
        AtomicPublish.currentSegments(spark, table)).nonEmpty,
        "precondition: the table must carry a pending upsert segment")
      def filesRun(d: org.apache.spark.sql.DataFrame): Long = {
        d.collect()
        d.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f.metrics("numFiles").value
        }.sum
      }
      val fAll = filesRun(
        AtomicPublish.read(spark, table).select(col("c_custkey")))
      val probe = AtomicPublish.read(spark, table)
        .filter(col("c_custkey") === 10)
      // reconciliation exactness first: the probe sees the MERGED value
      val row = probe.select(col("c_acctbal")).collect()
      assert(row.length === 1, s"expected exactly one row for key 10")
      val orig = cust.filter(col("c_custkey") === 10)
        .select(col("c_acctbal")).head.getDouble(0)
      assert(math.abs(row.head.getDouble(0) - (orig + 100.0)) < 1e-9,
        "pruned read must still reconcile the pending upsert")
      val fProbe = filesRun(probe.select(col("c_custkey")))
      assert(fAll > 0 && fProbe > 0)
      assert(fProbe <= fAll - 2,
        s"zonemaps must drop the two non-matching segments from the " +
          s"merge-pending scan: $fProbe of $fAll files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("optimize_cluster_pruned: clustering turns prune-nothing zonemaps selective") {
    // Before optimize, every segment is an orderkey slice spanning ALL
    // dates — the date predicate's file list equals the full scan's
    // (zonemaps keep everything). After the clustering rewrite the
    // same predicate must drop files: range-disjoint segments make the
    // same sidecar machinery selective. The drop is therefore evidence
    // of the REWRITE, not of the pruning code (already pinned above).
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec =>
        b.inputPartitions.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
      }.sum
    import org.apache.spark.sql.functions.col
    val table = graft.engine.Scratch.dir("spec_optimize_orders")
    val orders = graft.engine.Tables(spark, sfDir, "orders")
    graft.ops.AtomicPublish.publish(spark, table)(p =>
      orders.filter(col("o_orderkey") % 3 === 0).write.parquet(p))
    graft.ops.AtomicPublish.appendSegment(spark, table)(p =>
      orders.filter(col("o_orderkey") % 3 === 1).write.parquet(p))
    graft.ops.AtomicPublish.appendSegment(spark, table)(p =>
      orders.filter(col("o_orderkey") % 3 === 2).write.parquet(p))
    def datePred(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("o_orderdate") >=
        org.apache.spark.sql.functions.lit("1998-06-01").cast("timestamp"))
    val before = spark.read.format("graft").load(table)
    val (fBeforeAll, fBeforePred) = (files(before), files(datePred(before)))
    assert(fBeforePred === fBeforeAll,
      s"arrival-ordered layout should prune nothing: $fBeforePred of $fBeforeAll")
    val out = graft.ops.AtomicPublish.optimizeTable(spark, table,
      clusterBy = Seq("o_orderdate"), segments = 6)
    assert(out.isInstanceOf[graft.ops.AtomicPublish.CompactOutcome.Compacted],
      s"optimize did not commit: $out")
    val segsNow = graft.ops.AtomicPublish.currentSegments(spark, table)
    assert(segsNow.size >= 4, s"expected multiple disjoint segments: $segsNow")
    val after = spark.read.format("graft").load(table)
    val (fAfterAll, fAfterPred) = (files(after), files(datePred(after)))
    assert(fAfterPred > 0, "the matching range must survive")
    assert(fAfterPred < fAfterAll,
      s"clustered zonemaps must prune the date predicate: " +
        s"$fAfterPred of $fAfterAll")
    // content identity: the rewrite moved bytes, never changed them
    val n0 = orders.count()
    assert(after.count() === n0, "optimize must preserve row count")
  }

  test("scan_bloom_pruned: bloom sidecars drop non-matching segments from an id probe") {
    // The key's three `% 3` customer slices all span the FULL key
    // range, so zonemaps cannot prune them; any file-count reduction
    // under the IN-probe is bloom evidence. Probe keys 3 and 42 live
    // in segment 0 (`% 3 = 0`) — segments 1 and 2 must be gone unless
    // a (deterministic, per-dataset) false positive keeps one.
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    Registry.byKey("scan_bloom_pruned").build(spark, sfDir).collect()
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec =>
        b.inputPartitions.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
      }.sum
    val all = spark.sql("SELECT c_custkey FROM graft_bloom_customer")
    val probe = spark.sql(
      "SELECT c_custkey FROM graft_bloom_customer WHERE c_custkey IN (3, 42)")
    val (fAll, fProbe) = (files(all), files(probe))
    assert(fAll > 0, "unfiltered scan lists no files?")
    assert(fProbe > 0, "the probe must still read the matching segment")
    assert(fProbe < fAll,
      s"bloom pruning did not drop files: $fProbe of $fAll")
  }

  test("merge_delete: tombstone reconciliation broadcasts claims, corpus never reshuffles") {
    // The reconciled read of a table carrying pending tombstone+upsert
    // segments pays ONE claims join; the claims side is ∝ the merge
    // batches since the last fold, so it must broadcast — a
    // SortMergeJoin here would reshuffle the corpus per read at 100 TB.
    val p = plan("merge_delete")
    assert(p.contains("BroadcastHashJoin"),
      s"claims join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shuffle crept into the reconciled read:\n$p")
  }

  test("table_changes: classification never full-width-scans the corpus") {
    // The change feed reads the from-snapshot KEYS ONLY (classification
    // input) plus the new segments; the snapshot's non-key columns must
    // be pruned from its scan, and the only wide reads are the window's
    // own segments.
    val df = Registry.byKey("table_changes").build(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // snapshot key scan: some scan reads c_custkey alone (pruned);
    // every wide scan must belong to a new segment, all of which carry
    // the full row legitimately
    assert(p.contains("ReadSchema: struct<c_custkey:bigint>"),
      s"the from-snapshot scan must be pruned to the merge key:\n$p")
  }

  test("published dim reports size statistics: joins auto-broadcast without a hint") {
    // the graft DSv2 inherits file-size statistics from the parquet
    // FileScan, so Spark's size-based join planning must broadcast a
    // small PUBLISHED dim against a big fact WITHOUT an explicit
    // broadcast() — the property that keeps ad-hoc SQL over catalog
    // tables from planning sort-merge joins at 100 TB
    import spark.implicits._
    val dim = graft.engine.Scratch.dir("spec_stats_dim")
    graft.ops.AtomicPublish.publish(spark, dim)(p =>
      graft.engine.Tables(spark, sfDir, "nation").write.parquet(p))
    val fact = graft.engine.Tables(spark, sfDir, "customer")
    val dimDf = spark.read.format("graft").load(dim)
    val p = fact.join(dimDf, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name").count()
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"published dim did not auto-broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge crept in:\n$p")
  }

  test("catalog door keeps zonemap segment pruning (round 16: same scan as the path door)") {
    // The managed table delegates its ScanBuilder to the read-only
    // DSv2 table by composition — a date predicate through the NAME
    // must drop whole non-matching segments exactly like the path
    // door, or ad-hoc SQL over catalog tables re-scans the corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    val wh = graft.engine.Scratch.dir("spec_plancat_wh")
    spark.conf.set("spark.sql.catalog.plan_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.plan_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS plan_cat.db")
    val t = s"$wh/db/zorders"
    val orders = graft.engine.Tables(spark, sfDir, "orders")
    def slice(lo: String, hi: String) = orders.filter(
      $"o_orderdate" >= lit(lo).cast("timestamp") &&
        $"o_orderdate" < lit(hi).cast("timestamp"))
    graft.ops.AtomicPublish.publish(spark, t)(p =>
      slice("1970-01-01", "1997-01-01").write.parquet(p))
    graft.ops.AtomicPublish.appendSegment(spark, t)(p =>
      slice("1997-01-01", "1999-01-01").write.parquet(p))
    graft.ops.AtomicPublish.appendSegment(spark, t)(p =>
      slice("1999-01-01", "2031-01-01").write.parquet(p))
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case b: BatchScanExec =>
        b.inputPartitions.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
      }.sum
    val all = spark.sql("SELECT o_orderkey FROM plan_cat.db.zorders")
    val pruned = spark.sql(
      """SELECT o_orderkey FROM plan_cat.db.zorders
         WHERE o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'""")
    val (fAll, fPruned) = (files(all), files(pruned))
    assert(fAll > 0 && fPruned > 0, s"scans list no files: $fAll/$fPruned")
    assert(fPruned <= fAll - 2,
      s"catalog scan did not segment-prune: $fPruned of $fAll")
  }
}
