package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupCluster, MinHashDedup}
import graft.engine.Tables

/** Transitive-closure properties of duplicate-cluster resolution. */
class DedupClusterSpec extends SparkSpec {

  test("transitive chains collapse; labels are the component minimum") {
    import spark.implicits._
    // chain 1-2, 2-3 (never 1-3); separate pair 10-11; singleton 20.
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = DedupCluster.clusters(ids, "id", pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) === ((1L, 3L, true)))
    assert(out(2L) === ((1L, 3L, false)))
    assert(out(3L) === ((1L, 3L, false)))
    assert(out(10L) === ((10L, 2L, true)))
    assert(out(11L) === ((10L, 2L, false)))
    assert(out(20L) === ((20L, 1L, true)))
  }

  test("keeper count = cluster count; every doc labeled exactly once") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents").filter($"doc_id" < 500)
    val pairs = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      numHashes = 16, bands = 4)
    val out = DedupCluster.clusters(docs.select($"doc_id"), "doc_id", pairs)
    val n = docs.count()
    assert(out.count() === n, "clustering dropped or duplicated docs")
    assert(out.select("doc_id").distinct().count() === n)
    val keepers = out.filter($"is_keeper").count()
    val clusters = out.select("cluster_id").distinct().count()
    assert(keepers === clusters, "one keeper per cluster")
    // cluster_size agrees with the actual membership count
    val bad = out.groupBy($"cluster_id", $"cluster_size")
      .agg(count(lit(1)).as("m"))
      .filter($"m" =!= $"cluster_size").count()
    assert(bad === 0L, "cluster_size disagrees with membership")
  }

  test("minhash-pair clustering groups the planted near-dup families") {
    import spark.implicits._
    // documents at consecutive ids sharing long prefixes are the
    // corpus's planted near-dups; exact-Jaccard >= 0.5 pairs define
    // truth. CC over MinHash candidates filtered at est >= 0.5 must
    // place every TRUE pair in one cluster when its est passes —
    // recall of the signature estimate itself is gated in LlmOpsSpec.
    val docs = Tables(spark, sfDir, "documents").filter($"doc_id" < 300)
    val est = MinHashDedup.candidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8)
      .filter($"est_jaccard" >= 0.5)
    val out = DedupCluster.clusters(docs.select($"doc_id"), "doc_id", est)
    val lbl = out.select($"doc_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = est.select($"id_a", $"id_b").collect()
    pairs.foreach { r =>
      assert(lbl(r.getLong(0)) === lbl(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
  }
}
