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

  /** (id_a, id_b, hamming) for every pair with hamming ≤ maxDist,
    * id_a < id_b. `fpCol` must be a 64-bit LongType fingerprint.
    */
  def pairsWithin(df: DataFrame, idCol: String, fpCol: String,
                  maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, s"maxDist $maxDist out of range")
    val bands = maxDist + 1
    val sizes = Array.tabulate(bands)(b => 64 / bands + (if (b < 64 % bands) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    val bandCols = (0 until bands).map { b =>
      // A 64-bit band (maxDist=0 ⇒ one band) needs mask -1L: JVM shifts
      // are mod 64, so (1L << 64) - 1 would evaluate to 0 and collapse
      // every fingerprint into one bucket (full cross product).
      val mask = if (sizes(b) >= 64) -1L else (1L << sizes(b)) - 1
      struct(lit(b).as("band"),
        shiftrightunsigned(col(fpCol), offsets(b))
          .bitwiseAND(lit(mask)).as("bits"))
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
