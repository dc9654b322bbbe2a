package graft

import org.apache.spark.sql.streaming.StreamingQueryException

import graft.ops.AtomicPublish

/** `spark.readStream.table("cat.db.t")` — the V2 micro-batch tail of a
  * catalog-managed table (GraftTableStream.scala): per-segment
  * batches, admission control, the append-only loud failure, and the
  * starting-position options. */
class TableStreamSpec extends SparkSpec {

  private lazy val wh = {
    val dir = graft.engine.Scratch.dir("spec_tstream_wh")
    spark.conf.set("spark.sql.catalog.ts_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ts_cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ts_cat.db")
    dir
  }

  private val sinkN = new java.util.concurrent.atomic.AtomicInteger(0)

  private def msgs(x: Throwable): String =
    Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")

  test("readStream.table tails appends segment by segment") {
    wh
    spark.sql("CREATE TABLE ts_cat.db.tail (k BIGINT, v STRING)")
    spark.sql("INSERT INTO ts_cat.db.tail VALUES (1,'a'), (2,'b')")
    val name = s"tstream_${sinkN.incrementAndGet()}"
    val q = spark.readStream.table("ts_cat.db.tail")
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 2)
      spark.sql("INSERT INTO ts_cat.db.tail VALUES (3,'c')")
      q.processAllAvailable()
      assert(spark.table(name).collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("maxSegmentsPerBatch paces a backlog; startingOffset=latest skips it") {
    wh
    spark.sql("CREATE TABLE ts_cat.db.paced (k BIGINT)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO ts_cat.db.paced VALUES ($i)"))
    val name = s"tstream_${sinkN.incrementAndGet()}"
    val q = spark.readStream.option("maxSegmentsPerBatch", "1")
      .table("ts_cat.db.paced")
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 3)
      // the 4-segment backlog (create + 3 inserts) drained in >1 batch
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()

    val name2 = s"tstream_${sinkN.incrementAndGet()}"
    val q2 = spark.readStream.option("startingOffset", "latest")
      .table("ts_cat.db.paced")
      .writeStream.format("memory").queryName(name2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table(name2).count() === 0)
      spark.sql("INSERT INTO ts_cat.db.paced VALUES (99)")
      q2.processAllAvailable()
      assert(spark.table(name2).collect().map(_.getLong(0)).toSeq ===
        Seq(99L))
    } finally q2.stop()
  }

  test("startingVersion arms the tail at a commit floor") {
    wh
    spark.sql("CREATE TABLE ts_cat.db.versioned (k BIGINT)")   // v1
    spark.sql("INSERT INTO ts_cat.db.versioned VALUES (1)")    // v2
    spark.sql("INSERT INTO ts_cat.db.versioned VALUES (2)")    // v3
    val name = s"tstream_${sinkN.incrementAndGet()}"
    // consume commit 3 and later only
    val q = spark.readStream.option("startingVersion", "3")
      .table("ts_cat.db.versioned")
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).collect().map(_.getLong(0)).toSeq ===
        Seq(2L))
      // exclusive with the other starting options
      val e = intercept[Exception] {
        spark.readStream.option("startingVersion", "2")
          .option("startingOffset", "latest")
          .table("ts_cat.db.versioned")
          .writeStream.format("memory")
          .queryName(s"tstream_${sinkN.incrementAndGet()}").start()
          .processAllAvailable()
      }
      assert(msgs(e).contains("mutually exclusive"), msgs(e))
    } finally q.stop()
  }

  test("a fold under the stream fails loudly and names the change feed") {
    wh
    spark.sql("CREATE TABLE ts_cat.db.folded (k BIGINT)")
    spark.sql("INSERT INTO ts_cat.db.folded VALUES (1)")
    spark.sql("INSERT INTO ts_cat.db.folded VALUES (2)")
    val name = s"tstream_${sinkN.incrementAndGet()}"
    val q = spark.readStream.table("ts_cat.db.folded")
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 2)
      spark.sql("OPTIMIZE ts_cat.db.folded") // fold: rewrites the prefix
      spark.sql("INSERT INTO ts_cat.db.folded VALUES (3)")
      val e = intercept[Exception] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      assert(msgs(e).contains("graft-cdf"), msgs(e))
    } finally q.stop()
  }

  test("batch reads through the managed table still prune and report statistics") {
    wh
    // the scan wrapper must not cost the batch path anything: the
    // whole PlanSpec pruning/broadcast family runs through it now;
    // here just pin that a filter still prunes columns at the scan
    spark.sql("CREATE TABLE ts_cat.db.batchy (k BIGINT, v STRING, w STRING)")
    spark.sql("INSERT INTO ts_cat.db.batchy SELECT id, 'x', 'y' FROM range(10)")
    val plan = spark.sql("SELECT k FROM ts_cat.db.batchy WHERE k = 3")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && !plan.contains("SortMergeJoin"),
      plan)
  }
}
