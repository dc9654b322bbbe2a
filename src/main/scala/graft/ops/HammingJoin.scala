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
                      pairsPerDoc: Double = 2.0): Int = {
    require(maxDist >= 0 && maxDist < 32, s"maxDist $maxDist out of range")
    val ks = (maxDist + 1) to math.min(maxBlocks, 64)
    ks.minBy(modeledCost(n, maxDist, _, pairsPerDoc))
  }

  private def choose(k: Int, m: Int): Double =
    (0 until m).foldLeft(1.0)((a, i) => a * (k - i) / (i + 1))

  /** The provisioning cost model for one k: index rows + expected
    * bucket-collision candidates + true-pair emission multiplicity. */
  def modeledCost(n: Long, maxDist: Int, k: Int,
                  pairsPerDoc: Double = 2.0): Double = {
    val m = k - maxDist
    val combos = choose(k, m)
    val keyBits = math.min(62, m * (64 / k))
    combos * n.toDouble +
      combos * n.toDouble * n.toDouble / math.pow(2.0, keyBits + 1) +
      pairsPerDoc * n.toDouble * choose(k - 1, m)
  }

  /** Conf key bounding the modeled row budget an exact Hamming join may
    * plan (index rows + candidates). Mirrors
    * [[AnnSearch.MaxBruteCosinesKey]]: the right ceiling depends on
    * cluster parallelism, so it is a conf, not a constant. */
  val MaxModeledCostKey = "spark.graft.hamming.maxModeledCost"

  /** Refuse AT PLAN TIME when even the best k exceeds the budget —
    * the regime where the 64-bit combination-blocked pigeonhole
    * fundamentally explodes (measured: 5 M docs at radius 6 DNF'd a
    * 900 s budget at ×1000 scale; every k ≤ 16 models ≥ 10⁹ index
    * rows or collision pairs). A loud refusal with the numbers beats
    * a silent multi-hour join; the designed escapes are a smaller
    * radius, a pre-shard by exact-dup hash, or a recursive half-word
    * pigeonhole (distance ≤ d pairs agree within ⌈d/2⌉ on one 32-bit
    * half) — none of which this call can pick silently without
    * changing the operator's exact contract.
    */
  def requireFeasible(spark: org.apache.spark.sql.SparkSession, n: Long,
                      maxDist: Int, k: Int,
                      pairsPerDoc: Double = 2.0): Unit = {
    val budget = spark.conf.getOption(MaxModeledCostKey)
      .map(_.toDouble).getOrElse(2e9)
    val cost = modeledCost(n, maxDist, k, pairsPerDoc)
    require(cost <= budget,
      f"exact Hamming join over n=$n%d fingerprints at radius $maxDist " +
        f"models $cost%.2g index+candidate rows with best k=$k — over " +
        f"budget $budget%.2g ($MaxModeledCostKey). Reduce the radius, " +
        "pre-shard the corpus, or raise the budget for a larger cluster.")
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
                  maxDist: Int, blocks: Int = 0): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, s"maxDist $maxDist out of range")
    val k = if (blocks <= 0) maxDist + 1 else blocks
    require(k > maxDist && k <= 64,
      s"blocks=$k must exceed maxDist=$maxDist (pigeonhole) and fit 64 bits")
    val m = k - maxDist
    val sizes = Array.tabulate(k)(b => 64 / k + (if (b < 64 % k) 1 else 0))
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
}
