package graft

import org.apache.spark.sql.functions._
import graft.ops.{Compact, MergeInto}

/** Table-maintenance semantics: MERGE upsert row accounting and plan
  * shape, compaction file-count collapse with exact content round-trip.
  */
class MaintenanceSpec extends SparkSpec {

  test("merge upsert: updates win, inserts land, untouched rows pass through") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq((2L, "b2", 99.0), (9L, "new", 1.0))
      .toDF("k", "name", "bal")
    val out = MergeInto.upsert(target, source, Seq("k"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (9L, "new", 1.0)))
  }

  test("merge upsert plans an anti join, never a full-outer") {
    import spark.implicits._
    val target = graft.engine.Tables(spark, sfDir, "customer")
    val source = target.filter($"c_custkey" % 10 === 3)
    val p = MergeInto.upsert(target, source, Seq("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"expected an anti join:\n$p")
    assert(!p.contains("FullOuter"), s"full-outer join crept in:\n$p")
  }

  test("compaction collapses the fragment count, content exact") {
    import spark.implicits._
    val base = graft.engine.Tables(spark, sfDir, "lineitem")
    val frag = graft.engine.Scratch.dir("spec_lineitem_frag")
    val out = graft.engine.Scratch.dir("spec_lineitem_compact")
    base.repartition(64).write.mode("overwrite").parquet(frag)
    val nFrag = Compact.parquetFileCount(spark, frag)
    assert(nFrag >= 32, s"fragmentation failed: $nFrag files")
    val compacted = Compact.rewrite(spark, frag, out, targetBytes = 64L * 1024 * 1024)
    val n = Compact.parquetFileCount(spark, out)
    assert(n >= 1 && n <= 2, s"expected ~1 compacted file, got $n")
    // exact content round trip (multiset compare — no unique sort key
    // at this sf: (l_orderkey, l_linenumber) has ties in sf0.001)
    assert(compacted.collect().map(_.toString).sorted.toSeq ===
      base.collect().map(_.toString).sorted.toSeq)
  }

  test("compaction partition count scales with real input bytes") {
    val base = graft.engine.Tables(spark, sfDir, "lineitem")
    val frag = graft.engine.Scratch.dir("spec_lineitem_frag2")
    val out = graft.engine.Scratch.dir("spec_lineitem_compact2")
    base.repartition(16).write.mode("overwrite").parquet(frag)
    // a tiny target forces multiple output files: ceil(bytes/target) > 1
    val tiny = 16L * 1024
    Compact.rewrite(spark, frag, out, targetBytes = tiny)
    assert(Compact.parquetFileCount(spark, out) > 1,
      "tiny target must yield multiple output files")
  }
}
