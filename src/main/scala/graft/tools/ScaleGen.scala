package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence generator: replicates the driver's sf0.1 tables ×N
  * into a scratch directory shaped like a real larger scale factor
  * (SURVEY.md §2 bench evidence; VERDICT round-5 item 5).
  *
  * Naive row duplication would be dishonest: identical keys on both
  * sides of a join multiply matches ×N² (not ×N), and identical
  * text/embeddings turn every LSH bucket into an N× clump whose
  * candidate-pair term grows ×N². So each copy i is decorrelated:
  *
  *   - every join key gets a per-copy offset of i·1e8, so copy i of
  *     lineitem joins copy i of orders/part/supplier only — join
  *     output scales ×N exactly like a real bigger SF;
  *   - region/nation stay fixed (TPC-H dims don't scale);
  *   - documents.text is circularly word-rotated by a copy-dependent
  *     amount AND suffixed with a per-copy salt token — near-identical
  *     length/vocab distribution, different shingles, and globally
  *     unique text per copy (no artificial cross-copy duplicate
  *     clusters at any N), so MinHash/SimHash see N independent corpora;
  *   - embeddings are circularly element-shifted (negated every second
  *     64-copy cycle) — identical norm and coordinate distribution,
  *     near-zero-or-negative cosine to the original, so ANN/near-dup
  *     candidate sets scale linearly;
  *   - events keep their timestamps (a bigger SF means more events in
  *     the same window — throughput scaling, the streaming-real case).
  *
  * Copy 0 is byte-identical to sf0.1. Deterministic throughout — no
  * RNG, every transform is a pure column expression.
  */
object ScaleGen {
  /** Key offset between copies: > any key in the SOURCE dir. The
    * default clears sf0.1; SPARK_GRAFT_SCALE_OFF lets a second-level
    * run compose (e.g. sf100 from sf10, whose keys already reach
    * 99·10⁸ + base, needs 10¹⁰) — two-level generation keeps the
    * union width at 10 instead of a 1000-branch plan.
    */
  private val Off = sys.env.get("SPARK_GRAFT_SCALE_OFF")
    .map(_.toLong).getOrElse(100000000L)

  private def withOffsets(df: DataFrame, i: Int, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Off)))

  /** Per-copy deterministic word PERMUTATION (hash-shuffle) + ~25%
    * word-type MUTATION + salt token. Each defeats a different
    * correlation a naive replica plants:
    *
    *  - Why not cyclic rotation: rotation preserves the word-bigram SET
    *    (every bigram but the seam), so every copy is a TRUE near-dup
    *    of every other — MinHash faces 5000 docs × C(copies, 2) real
    *    pairs and the corpus itself grows quadratically (measured: the
    *    ×100 rotated corpus sent dedup_minhash past 900 s by
    *    construction, not by plan). Sorting words by
    *    xxhash64(word, position, copy) is a deterministic pseudorandom
    *    permutation that decorrelates SHINGLES while preserving length
    *    and vocab distribution.
    *  - Permutation alone still leaves the word MULTISET identical, and
    *    order-independent bag-of-words sketches hash the multiset:
    *    every copy kept a near-identical SimHash fingerprint (measured:
    *    dedup_simhash DNF'd at ×100 on the permuted corpus). Suffixing
    *    the ~25% of word TYPES with pmod(xxhash64(word, copy), 4) = 0 —
    *    a different subset each copy — moves fingerprints far apart in
    *    hamming space while keeping within-doc repetition structure
    *    (mutation is per word type, not per occurrence) and ~realistic
    *    vocab/length stats.
    *  - The trailing `c<i>` token guarantees cross-copy text uniqueness
    *    even for degenerate all-same-word docs.
    *
    * Within-copy duplicate structure is preserved (all transforms
    * depend on text+copy, not doc_id), so dedup ops still see the
    * planted clusters, ×N linearly — the real-larger-crawl model.
    * Copy 0 stays byte-identical to the source.
    */
  private def rotateText(c: String, i: Int): org.apache.spark.sql.Column =
    if (i == 0) col(c)
    else if (TextMode == "heaps") heapsText(c, i)
    else {
      val shuffled = expr(
        s"""array_join(
              transform(
                array_sort(
                  zip_with(split($c, ' '), sequence(1, size(split($c, ' '))),
                    (wrd, p) -> struct(xxhash64(wrd, p, $i) AS h, wrd AS w))),
                s -> IF(pmod(xxhash64(s.w, $i), 4) = 0, concat(s.w, 'x'), s.w)),
              ' ')""")
      concat(shuffled, lit(s" c$i"))
    }

  /** SPARK_GRAFT_SCALE_TEXTMODE=heaps: decorrelation tuned for the
    * VOCABULARY-STATISTICS decade rows (ngram_lm_counts, bigram_pmi,
    * contamination_ngram). The default permutation mode shuffles word
    * order per copy, which makes the BIGRAM type count grow ~linearly
    * with copies (each copy's random adjacencies are new) — real
    * corpora follow Heaps' law, V(n) ∝ n^β with β ≈ 0.5, so the
    * default corpus overstates those keys' per-decade cost (round-9
    * VERDICT: 6.6×/decade driven by the generator, not the plan).
    *
    * Heaps mode PRESERVES word order and mutates a 1/(4·√(i+1))
    * fraction of word TYPES with a copy-unique suffix: new unigram
    * types per copy ≈ V₀/(4√(i+1)) → V(C) ≈ V₀·(1 + √C/2), and with
    * order preserved new bigram types are only those touching a
    * mutated word — likewise ~√C. Under two-level composition
    * (sf10 → sf100) the law compounds as ≈ V₀·(1+√C₁/2)(1+√C₂/2),
    * still sub-linear in total copies. The trailing salt token keeps
    * every copy's text globally unique. NOT for dedup decade rows:
    * preserved order means copies are textual near-dups of each other
    * by construction (the permutation mode exists precisely to avoid
    * that); use the default for every non-vocabulary key.
    */
  private def heapsText(c: String, i: Int): org.apache.spark.sql.Column = {
    val denom = math.max(2, math.round(4.0 * math.sqrt(i + 1.0)).toInt)
    val mutated = expr(
      s"""array_join(
            transform(split($c, ' '),
              w -> IF(pmod(xxhash64(w, $i), $denom) = 0,
                      concat(w, 'h$i'), w)),
            ' ')""")
    concat(mutated, lit(s" c$i"))
  }

  private val TextMode =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_TEXTMODE", "permute")

  /** Circular element shift of the 64-dim embedding: norm-preserving,
    * distribution-preserving, decorrelating (random-ish vectors have
    * ~0 cosine to their rotations). Shifts repeat after dim copies, so
    * every second 64-copy cycle is NEGATED — copies i and i+64 land
    * antipodal (cos −1), never identical; unique through 128 copies.
    */
  private def rotateVec(c: String, i: Int): org.apache.spark.sql.Column =
    if (i == 0) col(c) else {
      val v = col(c)
      val n = size(v)
      val s = pmod(lit(i * 7), greatest(n, lit(1)))
      val rot = when(n < 2, v).otherwise(
        concat(slice(v, s + 1, n - s), slice(v, lit(1), s)))
      if ((i / 64) % 2 == 1) transform(rot, x => -x) else rot
    }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/target/scratch/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events raw ns
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // table -> (join-key columns to offset, text col, vec col)
    val plan: Seq[(String, Seq[String], Option[String], Option[String])] = Seq(
      ("region", Nil, None, None), // fixed dim: single copy
      ("nation", Nil, None, None), // fixed dim: single copy
      ("customer", Seq("c_custkey"), None, None),
      ("supplier", Seq("s_suppkey"), None, None),
      ("part", Seq("p_partkey"), None, None),
      ("orders", Seq("o_orderkey", "o_custkey"), None, None),
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), None, None),
      ("events", Seq("event_id", "user_id"), None, None),
      ("documents", Seq("doc_id"), Some("text"), None),
      ("embeddings", Seq("vec_id"), None, Some("embedding")))

    // SPARK_GRAFT_SCALE_TABLES=documents,embeddings restricts output —
    // the heaps-mode vocabulary corpora need only `documents`, so the
    // decade scratch stays hundreds of MB, not a full 21 GB sf100.
    val onlyTables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).toSet)
    plan.filter(p => onlyTables.forall(_.contains(p._1)))
      .foreach { case (name, keys, textCol, vecCol) =>
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val scaled =
        if (keys.isEmpty) base // fixed dims are not replicated
        else (0 until copies).map { i =>
          val keyed = withOffsets(base, i, keys)
          val t = textCol.fold(keyed)(c => keyed.withColumn(c, rotateText(c, i)))
          vecCol.fold(t)(c => t.withColumn(c, rotateVec(c, i)))
        }.reduce(_ unionAll _)
      // ~32 output files for fact tables: the same small-file/partition
      // hygiene a real ingest would use; tiny dims stay single-file.
      val out =
        if (keys.isEmpty) scaled.coalesce(1) else scaled.repartition(32)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"scalegen: $name -> $outDir/$name.parquet")
    }
    // CONTRACT STAMP (round-11 VERDICT item 7): the decade tables'
    // meaning depends on this generator's corpus law (permute vs heaps
    // text, mutation rates, copy count). Stamp the mode + provenance +
    // measured vocabulary into a sidecar at generation time;
    // dev/scale_decades.sh refuses a scratch dir whose stamp does not
    // match the requested mode, so a wrong-corpus decade row can no
    // longer be committed silently.
    val genTables = plan.filter(p => onlyTables.forall(_.contains(p._1)))
      .map(_._1)
    // A PARTIAL run (onlyTables) must not rewrite the stamp wholesale:
    // that would re-attribute tables generated earlier in this dir to
    // THIS run's mode/copies and erase their provenance —
    // dev/scale_decades.sh validates the whole dir by the stamp, so a
    // silent overwrite could let a wrong-corpus decade row through.
    // Rule: a partial run MERGES into a stamp whose identity fields
    // (textmode, copies, src) agree, and REFUSES loudly when they
    // differ (the dir then holds tables of two different laws — the
    // caller must regenerate fully or use a fresh dir). A full run
    // regenerates every table and may overwrite unconditionally.
    val stampPath = java.nio.file.Paths.get(outDir, "SCALEGEN.json")
    val existing =
      if (java.nio.file.Files.exists(stampPath))
        Some(java.nio.file.Files.readString(stampPath))
      else None
    // Stamp parsing goes through a REAL JSON reader (Spark's bundled
    // Jackson), not field regexes: a reordered field, a quote in a
    // path, or pretty-printing drift must either parse correctly or
    // refuse LOUDLY — a silent None here would drop carried tables or
    // misfire the identity-mismatch refusal (round-12 ADVICE).
    def parsed(json: String): com.fasterxml.jackson.databind.JsonNode =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"SCALEGEN.json at $stampPath is not valid JSON " +
            s"(${e.getMessage}) — regenerate the dir fully or use a fresh one")
      }
    def strField(n: com.fasterxml.jackson.databind.JsonNode,
                 f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText)
    val mergedTables = (existing, onlyTables) match {
      case (Some(old), Some(_)) =>
        val node = parsed(old)
        val oldMode = strField(node, "textmode")
        val oldCopies = strField(node, "copies")
        val oldSrc = strField(node, "src")
        require(oldMode.contains(TextMode) && oldCopies.contains(copies.toString)
            && oldSrc.contains(srcDir),
          s"REFUSING partial regeneration into $outDir: existing stamp says " +
            s"(textmode=${oldMode.orNull}, copies=${oldCopies.orNull}, " +
            s"src=${oldSrc.orNull}) but this run is (textmode=$TextMode, " +
            s"copies=$copies, src=$srcDir) — tables of two different corpus " +
            "laws must not share a dir; regenerate fully or use a fresh dir")
        val oldTables = Option(node.get("tables")).toSeq
          .flatMap(t => (0 until t.size).map(i => t.get(i).asText))
          .filter(_.nonEmpty)
        (oldTables ++ genTables).distinct
      case _ => genTables
    }
    val vocab =
      if (genTables.contains("documents")) {
        import org.apache.spark.sql.functions.{countDistinct, explode, split => fsplit, col => fcol}
        val docs = spark.read.parquet(s"$outDir/documents.parquet")
        val toks = docs.select(explode(fsplit(fcol("text"), " ")).as("w"))
        val uni = toks.agg(countDistinct(fcol("w"))).collect()(0).getLong(0)
        s""""unigram_types": $uni"""
      } else {
        // documents not regenerated: carry the measured vocabulary of
        // the run that DID generate them (merge, don't erase)
        val carried = existing
          .flatMap(old => strField(parsed(old), "unigram_types"))
          .getOrElse("null")
        s""""unigram_types": $carried"""
      }
    val stamp =
      s"""{
         |  "generator": "graft.tools.ScaleGen",
         |  "textmode": "$TextMode",
         |  "copies": $copies,
         |  "src": "$srcDir",
         |  "key_offset": $Off,
         |  "tables": [${mergedTables.map(t => s""""$t"""").mkString(", ")}],
         |  $vocab
         |}""".stripMargin
    java.nio.file.Files.writeString(stampPath, stamp)
    println(s"scalegen: stamped $outDir/SCALEGEN.json (textmode=$TextMode)")
    spark.stop()
  }
}
