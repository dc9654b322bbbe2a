package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All pairs of 64-bit fingerprints within a Hamming distance bound,
  * via the standard multi-index pigeonhole — the scale-safe replacement
  * for the all-pairs `a.join(b, id_a < id_b)` nested loop.
  *
  * Split the 64 bits into `maxDist + 1` disjoint bands: two
  * fingerprints differing in ≤ maxDist bits MUST agree exactly on at
  * least one band (pigeonhole), so candidate generation is a plain
  * shuffle equi-join on (band, bandBits) — ~linear in true near-dups —
  * followed by the exact `bit_count(xor)` check. No recall loss: unlike
  * LSH this blocking is EXACT for the distance bound, so the output is
  * identical to the quadratic scan's.
  */
object HammingJoin {

  /** Pick the block count k for [[pairsWithin]] from the corpus size —
    * the same statistics-fed planning [[AnnSearch.provisionLshForCorpus]]
    * does for LSH, but with zero recall stakes (every k is exact; only
    * cost changes). Model, under uniform band occupancy: index/shuffle
    * rows C(k,m)·n plus expected same-bucket candidate pairs
    * C(k,m)·n²/2^(m·⌊64/k⌋+1). Small n wants the minimal index
    * (k = d+1); as n grows the n² term forces wider keys — k rises and
    * candidates stay ~linear in true near-dups. Deterministic, no data
    * scan: feed n from table stats / parquet footers
    * ([[AnnSearch.parquetRowCount]]).
    */
  /** @param pairsPerDoc expected TRUE near-dup pairs per document —
    *   the third cost term. A qualifying pair agreeing on `a` blocks is
    *   emitted C(a, m) times before the dedup groupBy, and `a` can
    *   reach k−1 (all flipped bits in one block), so dup-dense corpora
    *   punish large k hard: measured on the ×100 decade corpus
    *   (500 k docs, 11.3 true pairs/doc) k=8 runs 2.0× faster than
    *   k=7 AND 1.25× faster than the pair-blind model's k=9 pick.
    *   Default 2.0 ≈ a lightly duplicated raw crawl; pass the real
    *   density when a prior dedup pass measured it.
    */
  def provisionBlocks(n: Long, maxDist: Int, maxBlocks: Int = 16,
                      pairsPerDoc: Double = 2.0, width: Int = 64): Int = {
    require(maxDist >= 0 && maxDist < width, s"maxDist $maxDist out of range")
    val ks = (maxDist + 1) to math.min(maxBlocks, width)
    ks.minBy(modeledCost(n, maxDist, _, pairsPerDoc, width))
  }

  private def choose(k: Int, m: Int): Double =
    (0 until m).foldLeft(1.0)((a, i) => a * (k - i) / (i + 1))

  /** The provisioning cost model for one k: index rows + expected
    * bucket-collision candidates + true-pair emission multiplicity. */
  def modeledCost(n: Long, maxDist: Int, k: Int,
                  pairsPerDoc: Double = 2.0, width: Int = 64): Double = {
    val m = k - maxDist
    val combos = choose(k, m)
    val keyBits = math.min(62, m * (width / k))
    combos * n.toDouble +
      combos * n.toDouble * n.toDouble / math.pow(2.0, keyBits + 1) +
      pairsPerDoc * n.toDouble * choose(k - 1, m)
  }

  /** Conf key bounding the modeled row budget an exact Hamming join may
    * plan (index rows + candidates). Mirrors
    * [[AnnSearch.MaxBruteCosinesKey]]: the right ceiling depends on
    * cluster parallelism, so it is a conf, not a constant. */
  val MaxModeledCostKey = "spark.graft.hamming.maxModeledCost"

  /** Plan from table stats (no scan): the flat combination index while
    * its model fits the budget, else a LOUD refusal carrying the
    * modeled numbers. The refusal message names the escapes; the
    * half-word recursion ([[pairsWithinHalved]]) is deliberately NOT
    * an automatic rung — it is exact and was built and gated as such,
    * but MEASURED on this dup-dense corpus family it loses badly
    * (sf10, 500 k docs: flat 1.3 s vs halved 200 s with the
    * provisioned half-k — near-dup clusters make 32-bit halves agree
    * within radius ⌊d/2⌋ far more often than the uniform model says,
    * so the half-candidate set explodes). A corpus whose half-distance
    * distribution is benign can call it explicitly.
    */
  def planStrategy(n: Long, maxDist: Int, budget: Double,
                   pairsPerDoc: Double = 2.0): Either[String, Int] = {
    val k1 = provisionBlocks(n, maxDist, pairsPerDoc = pairsPerDoc)
    val c1 = modeledCost(n, maxDist, k1, pairsPerDoc)
    if (c1 <= budget) Right(k1)
    else Left(
      f"exact Hamming join over n=$n%d fingerprints at radius $maxDist " +
        f"models $c1%.2g index+candidate rows with best k=$k1 — over " +
        f"budget $budget%.2g ($MaxModeledCostKey). Reduce the radius, " +
        "pre-shard the corpus, call pairsWithinHalved explicitly if the " +
        "corpus's half-distance distribution is benign, or raise the " +
        "budget for a larger cluster.")
  }

  /** Stats-planned exact Hamming pairs: the flat index when feasible,
    * a loud plan-time refusal (never a silent multi-hour join) when
    * the model says the corpus is out of regime. */
  def pairsWithinAdaptive(spark: org.apache.spark.sql.SparkSession,
                          df: DataFrame, idCol: String, fpCol: String,
                          maxDist: Int, n: Long,
                          pairsPerDoc: Double = 2.0): DataFrame = {
    val budget = spark.conf.getOption(MaxModeledCostKey)
      .map(_.toDouble).getOrElse(2e9)
    planStrategy(n, maxDist, budget, pairsPerDoc) match {
      case Left(msg) => throw new IllegalArgumentException(msg)
      case Right(k) => pairsWithin(df, idCol, fpCol, maxDist, k)
    }
  }

  /** (id_a, id_b, hamming) for every pair with hamming ≤ maxDist,
    * id_a < id_b. `fpCol` must be a 64-bit LongType fingerprint.
    *
    * `blocks` (k) widens the pigeonhole: with k > maxDist+1 blocks, ≤
    * maxDist flipped bits corrupt ≤ maxDist blocks, so a qualifying
    * pair agrees on ≥ m = k − maxDist blocks — index every doc once per
    * C(k, m) block COMBINATION and equi-join on the m packed block
    * values. Still exact (pure pigeonhole, zero recall loss — the
    * output is bit-identical for any k), but the join key grows from
    * 64/k to 64·m/k bits: at maxDist=6, k=8 turns ~9-bit keys (n²/2⁹
    * bucket collisions per band — the measured ×100-decade wall) into
    * 16-bit keys for 4× more index rows — a ~32× candidate cut that
    * compounds with corpus size. k=0 (default) means maxDist+1: single
    * disjoint bands, the classic minimal index. Choose k by corpus
    * size: [[provisionBlocks]].
    */
  def pairsWithin(df: DataFrame, idCol: String, fpCol: String,
                  maxDist: Int, blocks: Int = 0): DataFrame =
    pairsWithinWidth(df, idCol, fpCol, maxDist, blocks, width = 64)

  /** [[pairsWithin]] over fingerprints occupying only the low `width`
    * bits — the banding must split exactly the populated bits, or
    * all-zero upper blocks form constant (hot) bucket keys whose
    * combos degenerate to full cross products. */
  private def pairsWithinWidth(df: DataFrame, idCol: String, fpCol: String,
                               maxDist: Int, blocks: Int,
                               width: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < width, s"maxDist $maxDist out of range")
    val k = if (blocks <= 0) maxDist + 1 else blocks
    require(k > maxDist && k <= width,
      s"blocks=$k must exceed maxDist=$maxDist (pigeonhole) and fit $width bits")
    val m = k - maxDist
    val sizes = Array.tabulate(k)(b => width / k + (if (b < width % k) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    // A 64-bit band (maxDist=0, k=1) needs mask -1L: JVM shifts are
    // mod 64, so (1L << 64) - 1 would evaluate to 0 and collapse
    // every fingerprint into one bucket (full cross product).
    def block(b: Int): Column = {
      val mask = if (sizes(b) >= 64) -1L else (1L << sizes(b)) - 1
      shiftrightunsigned(col(fpCol), offsets(b)).bitwiseAND(lit(mask))
    }
    val bandCols = (0 until k).combinations(m).toSeq.zipWithIndex.map {
      case (combo, ci) =>
        // pack the combo's m block values into one long join key
        // (m · ⌈64/k⌉ ≤ 64 bits by construction)
        val packed = combo.foldLeft(lit(0L): Column) { (acc, b) =>
          shiftleft(acc, sizes(b)).bitwiseOR(block(b))
        }
        struct(lit(ci).as("band"), packed.as("bits"))
    }
    val indexed = df
      .select(col(idCol).as("id"), col(fpCol).as("fp"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("fp"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    val a = indexed.select(col("id").as("id_a"), col("fp").as("fp_a"),
      col("band"), col("bits"))
    val b = indexed.select(col("id").as("id_b"), col("fp").as("fp_b"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      // a pair agreeing on several bands collides once per band — dedup.
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Exact Hamming pairs for the NEXT regime — where the single-level
    * combination index over 64 bits explodes for every k (measured at
    * 5 M fingerprints, radius 6: ≥4·10⁹ modeled rows, DNF'd a 900 s
    * budget). Recursive half-word pigeonhole instead: if
    * d = d_left + d_right ≤ maxDist, then min(d_left, d_right) ≤
    * ⌊maxDist/2⌋ — so every qualifying pair agrees WITHIN
    * ⌊maxDist/2⌋ on at least one 32-bit half. Generate candidates by
    * running the cheap radius-⌊d/2⌋ combination index on EACH half
    * (32-bit key space: the same k gives twice the key bits of the
    * 64-bit level, so collisions drop ~2^k-fold), union, then verify
    * the exact 64-bit distance. Output identical to [[pairsWithin]];
    * cost at 5 M docs ≈ 2×(half-index + half-collisions) ≈ 10⁹ —
    * inside the budget the flat index can't reach. The same recursion
    * applies again at the next ×100 (16-bit quarters at radius
    * ⌊d/4⌋), so this is the curve the operator rides at 100 TB, with
    * [[requireFeasible]] still refusing past wherever the model says
    * the cluster budget ends.
    */
  def pairsWithinHalved(df: DataFrame, idCol: String, fpCol: String,
                        maxDist: Int, blocksPerHalf: Int = 0): DataFrame = {
    require(maxDist >= 1 && maxDist < 32, s"maxDist $maxDist out of range")
    val dHalf = maxDist / 2
    val lo32 = col(fpCol).bitwiseAND(lit(0xffffffffL))
    val hi32 = shiftrightunsigned(col(fpCol), 32)
    def half(hc: Column, tag: String): DataFrame = {
      val withHalf = df.select(col(idCol).as("id"), hc.as("h"))
      // Band exactly the populated 32 bits (width=32): a 64-bit layout
      // would put constant-zero upper blocks into bucket keys, whose
      // all-upper combos degenerate into full cross products.
      pairsWithinWidth(withHalf, "id", "h", dHalf, blocksPerHalf, width = 32)
        .select(col("id_a"), col("id_b"))
    }
    val cands = half(lo32, "lo").unionAll(half(hi32, "hi"))
      .distinct()
    val fa = df.select(col(idCol).as("id_a"), col(fpCol).as("fp_a"))
    val fb = df.select(col(idCol).as("id_b"), col(fpCol).as("fp_b"))
    cands.join(fa, "id_a").join(fb, "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
