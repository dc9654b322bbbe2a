package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate candidate generation (SURVEY.md §2.9).
  *
  * The 100 TB story: exact pairwise Jaccard is a shingle self-join
  * whose output explodes quadratically per shared shingle. MinHash
  * compresses each doc to `numHashes` mins (one shuffle: explode →
  * groupBy doc), and LSH banding turns "find similar pairs" into an
  * equi-join on (band, bandHash) — only near-identical docs collide, so
  * the join output is ~linear in true duplicates. All hashing is
  * Spark's codegen'd xxhash64 with literal seeds — deterministic on any
  * cluster, no RNG at runtime.
  */
object MinHashDedup {

  /** Word-bigram shingles, distinct per doc. */
  def shingles(text: Column): Column =
    array_distinct(zip_with(
      slice(split(text, " "), lit(1), size(split(text, " ")) - 1),
      slice(split(text, " "), lit(2), size(split(text, " ")) - 1),
      (x, y) => concat(x, lit(" "), y)))

  /** (id, sig: array<long>) MinHash signatures, computed MAP-SIDE as a
    * single CODEGEN projection ([[graft.functions.MinHashSignature]]):
    * `sig[j] = min over shingles s of xxhash64(j, s)` — numerically
    * identical to the explode → groupBy min-agg form (the equality is
    * ScalaTest-pinned against [[signaturesViaAgg]]) but with ZERO
    * shuffle AND zero interpreted-lambda cost: the former
    * nested-`transform` chain was lambda-HOF territory Catalyst never
    * codegens (measured as the dominant constant of the sf100
    * incremental leg, ~65 s), where the native expression hashes
    * contiguous byte slices of the text in a primitive loop inside
    * whole-stage codegen. Docs with no shingles (single-word) return a
    * NULL signature and drop, exactly as explode dropped them.
    *
    * WHICH FORM WHERE (both measured at sf0.1): a consumer that needs
    * signatures ONCE or TWICE (the incremental batch-vs-corpus join)
    * wants this projection — recompute is a single pass and the corpus
    * never shuffles. The SELF-join path ([[candidatePairs]]) consumes
    * signatures FOUR times (two band sides + two est-jaccard
    * fetch-backs); there the agg form's exchange materializes the sigs
    * once and ReusedExchange serves all four consumers, which beats 4×
    * recompute on wall (0.69 s vs 2.8 s for dedup_minhash) — the
    * classic shuffle-once-vs-recompute trade, decided per shape. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        graft.engine.GraftFunctions.minhashSignature(
          docs.sparkSession, col(textCol), numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** The explode → groupBy min-agg form: pays one exchange of
    * (id, partial sig) to MATERIALIZE signatures, which ReusedExchange
    * then serves to every consumer — the right trade when one plan
    * references the signatures repeatedly (see [[signatures]] for the
    * full trade-off). Also the equality oracle for the map-side form
    * (LlmOpsSpec pins sig-for-sig equality on the graded corpus). */
  private[graft] def signaturesViaAgg(docs: DataFrame, idCol: String,
                                      textCol: String, numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol))).as("s"))
    val mins = (0 until numHashes).map(j => min(xxhash64(lit(j), col("s"))).as(s"h$j"))
    sh.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** Candidate pairs via banding: docs agreeing on ALL rows of any band
    * collide. `estJaccard` = fraction of agreeing signature components
    * (unbiased MinHash estimate).
    *
    * The band join carries ONLY (id, band, bh, bhs) — never the
    * signatures. Shipping sig_a/sig_b through the collision shuffle
    * would multiply its bytes by numHashes × 8 per row (at 128 hashes
    * on a 100 TB corpus, the dominant shuffle term); the signatures are
    * fetched back with two plain equi-joins to compute est_jaccard once
    * per pair — the id-only candidate pattern
    * [[AnnSearch.neardupCandidates]] documents.
    *
    * CANONICAL EMISSION (the HammingJoin.pairsWithin rule, landed here
    * round 11): a pair agreeing on `a` of the `bands` band hashes
    * collides `a` times, and round 10 deduped that multiplicity through
    * a full dropDuplicates(id_a, id_b) shuffle — a pair colliding in
    * `a` bands was shuffled `a` times and then paid a shuffle+agg to
    * dedup. Instead each side carries its COMPACT band-hash array
    * (`bhs`, bands × 8 bytes — the array the bands were exploded from)
    * and the join keeps a pair only where the joined band is the FIRST
    * index at which the two arrays agree: a zip-compare codegen filter,
    * zero extra shuffles, pair set identical (ScalaTest-gated equality
    * vs the dropDuplicates path in LlmOpsSpec).
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // agg form on purpose: this plan consumes sig 4× (see signatures)
    val sig = signaturesViaAgg(docs, idCol, textCol, numHashes)

    val banded = sig.select(col("id"),
        graft.engine.GraftFunctions.minhashBands(
          docs.sparkSession, col("sig"), bands).as("bhs"))
      .select(col("id"), col("bhs"), posexplode(col("bhs")).as(Seq("band", "bh")))

    val a = banded.select(col("id").as("id_a"), col("bhs").as("bhs_a"),
      col("band"), col("bh"))
    val b = banded.select(col("id").as("id_b"), col("bhs").as("bhs_b"),
      col("band"), col("bh"))
    val cand = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      // first agreeing band == this band (1-based array_position vs
      // 0-based band index) — each colliding pair survives exactly once
      .filter(array_position(
        zip_with(col("bhs_a"), col("bhs_b"), (x, y) => x === y),
        true) === col("band") + 1)
      .select(col("id_a"), col("id_b"))

    cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          bool => bool)).cast("double") / numHashes).as("est_jaccard"))
  }

  /** (id, band, bh) band-hash rows, fully MAP-SIDE (codegen
    * [[signatures]] + codegen band fold + posexplode) — the blocking
    * surface shared by the streaming dedup and direct LSH consumers.
    * Zero shuffles. */
  def bandHashes(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    signatures(docs, idCol, textCol, numHashes)
      .select(col("id"),
        graft.engine.GraftFunctions.minhashBands(
          docs.sparkSession, col("sig"), bands).as("bhs"))
      .select(col("id"), posexplode(col("bhs")).as(Seq("band", "bh")))
  }

  /** INCREMENTAL LSH candidates: a new batch of documents against an
    * existing corpus — the daily-ingest text-dedup shape (the fuzzy
    * twin of [[SemDedup.incrementalPairs]]). The corpus side NEVER
    * shuffles: its signatures and band hashes are map-side projections
    * (see [[signatures]]) and the batch's banded rows are explicitly
    * `broadcast` — the band join is a broadcast hash join probed as the
    * corpus streams by, so the whole candidate plan contains ZERO
    * shuffle exchanges (ScalaTest plan-asserted). Canonical emission
    * (the [[candidatePairs]] first-agreeing-band rule) makes each
    * (corpus, batch) pair surface exactly once with no dedup stage.
    *
    * `carry`: extra input columns to flow through the join, emitted as
    * `<name>_c` / `<name>_b`. Because every join here is map-side or
    * broadcast, carrying a column costs only the per-row copy — no
    * shuffle bytes — and it lets the caller verify candidates (e.g.
    * exact Jaccard over carried text) WITHOUT a second corpus scan:
    * the fused single-pass shape measured ~20% off the sf100 decade
    * leg (81 → 65 s) vs the join-back form, and is neutral at sf0.1
    * where per-job constants dominate.
    *
    * Returns (c_id, b_id, carried...). */
  def incrementalCandidates(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            numHashes: Int = 32, bands: Int = 8,
                            carry: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    def sigs(df: DataFrame): DataFrame =
      df.select((Seq(col(idCol).as("id"),
          graft.engine.GraftFunctions.minhashSignature(
            df.sparkSession, col(textCol), numHashes).as("sig")) ++
          carry.map(c => col(c).as(s"carry_$c"))): _*)
        .filter(col("sig").isNotNull)
    def banded(df: DataFrame, side: String): DataFrame =
      sigs(df)
        .select((Seq(col("id").as(s"${side}_id"),
          graft.engine.GraftFunctions.minhashBands(
            df.sparkSession, col("sig"), bands).as(s"bhs_$side")) ++
          carry.map(c => col(s"carry_$c").as(s"${c}_$side"))): _*)
        .select((Seq(col(s"${side}_id"), col(s"bhs_$side"),
          posexplode(col(s"bhs_$side")).as(Seq("band", "bh"))) ++
          carry.map(c => col(s"${c}_$side"))): _*)
    banded(corpus, "c")
      .join(broadcast(banded(batch, "b")), Seq("band", "bh"))
      .filter(array_position(
        zip_with(col("bhs_c"), col("bhs_b"), (x, y) => x === y),
        true) === col("band") + 1)
      .select((Seq(col("c_id"), col("b_id")) ++
        carry.flatMap(c => Seq(col(s"${c}_c"), col(s"${c}_b")))): _*)
  }
}
