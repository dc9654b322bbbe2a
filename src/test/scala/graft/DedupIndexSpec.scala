package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{AtomicPublish, DedupIndex, MinHashDedup, SemDedup}

/** The persisted incremental-dedup index: outputs bit-identical to the
  * recompute paths, reuse without rebuild, staleness-driven rebuild,
  * no-refit model loads, and exchange-free daily plans.
  */
class DedupIndexSpec extends SparkSpec {

  private def tmpTable(tag: String): String = {
    val d = java.nio.file.Paths.get("target/scratch/test-dedupindex")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.createTempDirectory(d, tag).toString
  }

  private def docs = Tables(spark, sfDir, "documents")
  private def emb = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("indexed minhash daily candidates equal the recompute path exactly") {
    val batch = docs.filter(col("doc_id") < 100)
    val corpus = docs.filter(col("doc_id") >= 100)
    val table = tmpTable("mh")
    DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    val daily = DedupIndex.dailyMinHashCandidates(spark, table, batch,
      _ => docs)
    val recompute = MinHashDedup.incrementalCandidates(
      corpus, batch, "doc_id", "text", carry = Seq("text"))
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val d = toSet(daily)
    val r = toSet(recompute)
    assert(r.nonEmpty, "graded corpus has no incremental candidate — vacuous")
    assert(d === r, s"extra: ${d.diff(r).take(3)}; missing: ${r.diff(d).take(3)}")
  }

  test("indexed minhash: daily plan has no shuffle exchange, in both text-fetch modes") {
    val batch = docs.filter(col("doc_id") < 100)
    val corpus = docs.filter(col("doc_id") >= 100)
    val table = tmpTable("mhplan")
    DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    def run() = DedupIndex.dailyMinHashCandidates(spark, table, batch, _ => docs)
    val pushdown = run()
    assert(!pushdown.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      s"pushdown-mode daily plan shuffles:\n${pushdown.queryExecution.executedPlan}")
    val pRows = pushdown.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // force the over-cap fallback (broadcast semi over full scan)
    spark.conf.set(DedupIndex.MaxPushdownIdsKey, "0")
    try {
      val fallback = run()
      assert(!fallback.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        s"fallback-mode daily plan shuffles:\n${fallback.queryExecution.executedPlan}")
      assert(fallback.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === pRows)
    } finally spark.conf.unset(DedupIndex.MaxPushdownIdsKey)
  }

  test("indexed semantic daily pairs equal incrementalPairs exactly; plan exchange-free") {
    val batch = emb.filter(col("vec_id") < 100)
    val corpus = emb.filter(col("vec_id") >= 100)
    val n = corpus.count()
    val table = tmpTable("sem")
    DedupIndex.ensureSemanticIndex(spark, table, corpus,
      s"$sfDir/embeddings.parquet", "vec_id>=100", "vec_id", "e",
      dim = 64, corpusSize = n)
    val daily = DedupIndex.dailySemanticPairs(spark, table, batch,
      "vec_id", "e", minCosine = 0.45)
    assert(!daily.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      s"semantic daily plan shuffles:\n${daily.queryExecution.executedPlan}")
    val recompute = SemDedup.incrementalPairs(spark, corpus, batch,
      "vec_id", "e", minCosine = 0.45, dim = 64, corpusSize = n)
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d = toSet(daily)
    val r = toSet(recompute)
    assert(r.nonEmpty, "graded corpus has no incremental semantic dup — vacuous")
    assert(d === r, s"extra: ${d.diff(r).take(3)}; missing: ${r.diff(d).take(3)}")
  }

  test("loaded quantizer model is bit-identical to the fitted one (no refit needed)") {
    val corpus = emb.filter(col("vec_id") >= 100)
    val n = corpus.count()
    val table = tmpTable("model")
    DedupIndex.ensureSemanticIndex(spark, table, corpus,
      s"$sfDir/embeddings.parquet", "vec_id>=100", "vec_id", "e",
      dim = 64, corpusSize = n)
    val loaded = DedupIndex.loadModel(spark, table)
    val k = SemDedup.cellCount(spark, n)
    val fitted = SemDedup.fit(spark, corpus, "vec_id", "e", k, 64, n)
    assert(loaded.k === fitted.k)
    assert(loaded.dim === fitted.dim)
    assert(java.util.Arrays.equals(loaded.cents, fitted.cents),
      "persisted centroids differ from a fresh deterministic fit")
  }

  test("indexed IVF top-k equals ivfTopK exactly; plan exchange-free up to the rank window") {
    import org.apache.spark.sql.functions.col
    val table = tmpTable("ivf")
    DedupIndex.ensureIvfIndex(spark, table, emb,
      s"$sfDir/embeddings.parquet", "all", "vec_id", "e")
    val daily = DedupIndex.ivfTopKIndexed(spark, table,
      emb.filter(col("vec_id") < 5), "vec_id", "e", k = 10)
    val recompute = graft.ops.AnnSearch.ivfTopK(spark, emb, "vec_id", "e",
      col("id") < 5, k = 10)
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val d = toSet(daily)
    val r = toSet(recompute)
    assert(r.nonEmpty)
    assert(d === r, s"extra: ${d.diff(r).take(3)}; missing: ${r.diff(d).take(3)}")
    // the only exchange in the daily plan is the rank window's — the
    // scan/join side is broadcast + cell-pruned read, no shuffle of
    // the index stream before ranking. (AQE's toString repeats the
    // initial plan below the final one — count the final section only.)
    val planStr = daily.queryExecution.executedPlan.toString
    val finalStr = planStr.split("== Initial Plan ==").head
    val exchanges = finalStr.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"unexpected exchanges:\n$finalStr")
  }

  test("minhash cycle: day-2 candidates over the appended index equal recompute over corpus ∪ day-1") {
    val day1 = docs.filter(col("doc_id") < 50)
    val day2 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
    val corpus = docs.filter(col("doc_id") >= 100)
    val table = tmpTable("cycle")
    DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100#cycle", "doc_id", "text", 32, 8)
    // day-1 verdict plan built BEFORE the append binds base-segment
    // paths — the append must not contaminate it
    val day1Before = DedupIndex.dailyMinHashCandidates(spark, table, day1, _ => docs)
    DedupIndex.appendToMinHashIndex(spark, table, day1)
    assert(day1Before.collect().forall(_.getLong(0) >= 100L),
      "day-1 plan leaked post-append segments")
    val day2Daily = DedupIndex.dailyMinHashCandidates(spark, table, day2, _ => docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val day2Recompute = MinHashDedup.incrementalCandidates(
        corpus.unionByName(day1), day2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(day2Recompute.exists(_._1 < 50L) || day2Recompute.nonEmpty,
      "vacuous: no day-2 candidates at all")
    assert(day2Daily === day2Recompute,
      s"extra: ${day2Daily.diff(day2Recompute).take(3)}; " +
        s"missing: ${day2Recompute.diff(day2Daily).take(3)}")
  }

  test("semantic append: planted day-2 clones are caught only after day-1 lands in the index") {
    import org.apache.spark.sql.functions._
    val day1 = emb.filter(col("vec_id") < 50)
    val corpus = emb.filter(col("vec_id") >= 100)
    // day 2 = near-exact clones of day 1 (cos ~ 1), disjoint ids
    val day2 = day1.select((col("vec_id") + 200000L).as("vec_id"),
      transform(col("e"), x => x + lit(0.001)).as("e"))
    val table = tmpTable("semcycle")
    DedupIndex.ensureSemanticIndex(spark, table, corpus,
      s"$sfDir/embeddings.parquet", "vec_id>=100#cycle", "vec_id", "e",
      dim = 64, corpusSize = corpus.count())
    val before = DedupIndex.dailySemanticPairs(spark, table, day2,
      "vec_id", "e", minCosine = 0.9)
    DedupIndex.appendToSemanticIndex(spark, table, day1)
    // pre-append plan bound the base segment only: no day-1 partners
    assert(before.collect().forall(_.getLong(1) >= 100L))
    val after = DedupIndex.dailySemanticPairs(spark, table, day2,
      "vec_id", "e", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val day1Ids = day1.collect().map(_.getLong(0)).toSet
    assert(day1Ids.nonEmpty)
    // every clone finds its source (same direction → same cell, cos ~ 1)
    val expected = day1Ids.map(id => (id + 200000L, id))
    assert(expected.subsetOf(after),
      s"clones missed after append: ${expected.diff(after).take(5)}")
  }

  test("seeded streaming minhash dedup ≡ batch collisions vs corpus ∪ earlier stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{BandProbe, MinHashStream}
    implicit val sqlCtx = spark.sqlContext
    val batch = docs.filter(col("doc_id") < 100)
    val corpus = docs.filter(col("doc_id") >= 100)
    val table = tmpTable("seed")
    DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    val seeds = DedupIndex.minHashSeedState(spark, table).as[(Int, Long, Long)]
    val probeRows = MinHashDedup.bandHashes(batch, "doc_id", "text", 32, 8)
      .select(col("id").as("doc_id"), col("band"), col("bh"))
      .orderBy(col("doc_id")).as[BandProbe].collect().toSeq
    val input = MemoryStream[BandProbe]
    val q = MinHashStream.verdictsSeeded(input.toDS(), seeds)
      .writeStream.format("memory").queryName("smh_seeded_spec")
      .outputMode("update").start()
    try probeRows.grouped(math.max(1, probeRows.size / 4 + 1)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    val kept = MinHashStream.survivors(spark, "smh_seeded_spec")
      .collect().map(_.longValue).toSet
    // batch reference: a stream doc is a dup iff any of its buckets is
    // held by the corpus or by an earlier stream doc
    val allBanded = MinHashDedup.bandHashes(docs, "doc_id", "text", 32, 8)
    val bB = allBanded.filter(col("id") < 100)
    val cB = allBanded.filter(col("id") >= 100)
    val dupVsCorpus = bB.as("a").join(cB.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.id")).collect().map(_.getLong(0)).toSet
    val dupVsEarlier = bB.as("a").join(bB.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") > col("b.id"))
      .select(col("a.id")).collect().map(_.getLong(0)).toSet
    val universe = bB.select(col("id")).distinct().collect().map(_.getLong(0)).toSet
    val expected = universe -- dupVsCorpus -- dupVsEarlier
    assert(dupVsCorpus.nonEmpty, "vacuous: no stream-vs-corpus collision on graded data")
    assert(kept === expected,
      s"extra: ${kept.diff(expected).take(5)}; missing: ${expected.diff(kept).take(5)}")
  }

  test("ensure* reuses a fresh index and rebuilds on identity change") {
    val corpus = docs.filter(col("doc_id") >= 100)
    val table = tmpTable("reuse")
    val v1 = DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    val v2 = DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 8)
    assert(v1 === v2, "matching identity must NOT republish")
    // any identity drift (here: band count) must republish a new version
    val v3 = DedupIndex.ensureMinHashIndex(spark, table, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100", "doc_id", "text", 32, 4)
    assert(v3 !== v2, "changed parameters must republish")
    // and the manifest now resolves the new version
    assert(AtomicPublish.currentDataDir(spark, table)
      .exists(d => s"$table/$d" == v3))
  }
}
