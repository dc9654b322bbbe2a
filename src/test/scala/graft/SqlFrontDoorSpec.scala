package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** The SQL-TEXT front door as evidence, not a single exhibit
  * (round-11 verdict item 6): the flagship analytics queries submitted
  * as `spark.sql` text over temp views must OPTIMIZE TO THE SAME PLAN
  * as their DataFrame builds (`LogicalPlan.sameResult` — canonicalized
  * comparison, attribute ids normalized), so a pandas/SQL user
  * arriving through either entry point gets one engine, not two.
  *
  * q10's GRADED build adds a bloom semi-reduction (a custom expression
  * stage SQL text cannot express), so its SQL leg is held to plan
  * equality against the PLAIN formulation plus row-for-row equality
  * against the graded build — the bloom stage is exact-superset by
  * construction, and this pins it.
  */
class SqlFrontDoorSpec extends SparkSpec {

  private def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "nation").foreach(t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t))

  private def assertSamePlan(sqlDf: DataFrame, dfDf: DataFrame, tag: String): Unit = {
    val sp = sqlDf.queryExecution.optimizedPlan
    val dp = dfDf.queryExecution.optimizedPlan
    assert(sp.sameResult(dp),
      s"$tag: SQL-text and DataFrame optimized plans differ\n--- SQL ---\n$sp\n--- DF ---\n$dp")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("q1 via spark.sql text optimizes to the DataFrame plan; results identical") {
    registerViews()
    val sqlDf = spark.sql(s"""
      SELECT l_returnflag, l_linestatus,
        ${Det.sql.dsum("l_quantity")} AS sum_qty,
        ${Det.sql.dsum("l_extendedprice")} AS sum_base_price,
        ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
        ${Det.sql.davg("l_quantity")} AS avg_qty,
        ${Det.sql.davg("l_extendedprice")} AS avg_price,
        ${Det.sql.davg("l_discount", 4)} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    val dfDf = queries.Registry.byKey("q1_pricing_summary").build(spark, sfDir)
    assertSamePlan(sqlDf, dfDf, "q1")
    assert(rows(sqlDf) === rows(dfDf))
  }

  test("q3 via spark.sql text optimizes to the DataFrame plan; results identical") {
    registerViews()
    val sqlDf = spark.sql(s"""
      SELECT l_orderkey, o_orderpriority,
        ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")
    val dfDf = queries.Registry.byKey("q3_shipping_priority").build(spark, sfDir)
    assertSamePlan(sqlDf, dfDf, "q3")
    assert(rows(sqlDf) === rows(dfDf))
  }

  test("q10 via spark.sql text: plan-equal to the plain build, row-equal to the graded bloom build") {
    import spark.implicits._
    registerViews()
    val sqlDf = spark.sql("""
      SELECT c_custkey, c_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue, rev_dec
      FROM (
        SELECT o_custkey,
          SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey) r
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY rev_dec DESC, c_custkey LIMIT 20""")
    // plain formulation: the graded build minus the (SQL-inexpressible)
    // bloom semi-reduction and the broadcast hint
    val ord = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val ret = Tables(spark, sfDir, "lineitem").filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val rev = ret.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev_dec"))
    val plain = rev.join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sfDir, "nation"), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name",
        $"rev_dec".cast("double").as("revenue"), $"rev_dec")
      .orderBy($"rev_dec".desc, $"c_custkey")
      .limit(20)
    assertSamePlan(sqlDf, plain, "q10-plain")
    val graded = queries.Registry.byKey("q10_returned_item").build(spark, sfDir)
    assert(rows(sqlDf.drop("rev_dec")) === rows(graded),
      "bloom-prefiltered graded build diverged from the SQL-text result")
  }

  test("published table via SQL text: view plan-equal to the ops-API read") {
    import spark.implicits._
    import graft.ops.{AtomicPublish, MergeInto}
    // round-13 gap: manifest tables (merge-sink state, indexes) were
    // invisible to the SQL catalog. registerView resolves the committed
    // version once; SQL text over the view must be the SAME plan as the
    // ops-API read — one engine, not two — and survive a later commit
    // (snapshot semantics: the view binds the registered version).
    val table = graft.engine.Scratch.dir("spec_sql_pub")
    AtomicPublish.publish(spark, table)(p =>
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal").write.parquet(p))
    MergeInto.upsertInto(spark, table,
      Seq((2L, 99.0), (3L, 30.0)).toDF("k", "bal"), Seq("k"))
    val viewed = AtomicPublish.registerView(spark, table, "spec_pub_v")
    val sqlDf = spark.sql("SELECT k, bal FROM spec_pub_v")
    assertSamePlan(sqlDf, viewed.select($"k", $"bal"), "published-view")
    assert(rows(spark.sql("SELECT k, bal FROM spec_pub_v ORDER BY k"))
      === Seq("1|10.0", "2|99.0", "3|30.0"))
    // snapshot semantics: a commit AFTER registration doesn't leak into
    // the registered view; re-registration advances it
    MergeInto.upsertInto(spark, table, Seq((4L, 40.0)).toDF("k", "bal"), Seq("k"))
    assert(rows(spark.sql("SELECT k FROM spec_pub_v ORDER BY k")) === Seq("1", "2", "3"))
    AtomicPublish.registerView(spark, table, "spec_pub_v")
    assert(rows(spark.sql("SELECT k FROM spec_pub_v ORDER BY k"))
      === Seq("1", "2", "3", "4"))
  }

  test("graft DSv2 source: format + USING graft resolve the manifest, prune, refuse unpublished") {
    import spark.implicits._
    import graft.ops.AtomicPublish
    val table = graft.engine.Scratch.dir("spec_dsv2_pub")
    AtomicPublish.publish(spark, table)(p =>
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "bal")
        .write.parquet(p))
    AtomicPublish.appendSegment(spark, table)(p =>
      Seq((3L, "c", 30.0)).toDF("k", "tag", "bal").write.parquet(p))
    // reader API: schema inferred, all segments read
    val viaFormat = spark.read.format("graft").load(table)
    assert(viaFormat.collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    // SQL text end-to-end: CREATE ... USING graft, then plain SELECT
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW spec_dsv2_v USING graft " +
      s"OPTIONS (path '$table')")
    assert(rows(spark.sql(
      "SELECT k, bal FROM spec_dsv2_v WHERE k >= 2 ORDER BY k"))
      === Seq("2|20.0", "3|30.0"))
    // inherited parquet machinery: the pushed filter reaches the scan
    val planned = spark.sql("SELECT k FROM spec_dsv2_v WHERE k = 3")
    val scan = planned.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(k,3"),
      s"filter did not reach the graft scan:\n$scan")
    // snapshot semantics: a commit after the read binds doesn't tear it;
    // a FRESH read sees the new version
    val before = spark.read.format("graft").load(table)
    AtomicPublish.appendSegment(spark, table)(p =>
      Seq((4L, "d", 40.0)).toDF("k", "tag", "bal").write.parquet(p))
    assert(before.collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    assert(spark.read.format("graft").load(table).count() === 4L)
    // unpublished directory: loud refusal naming the remedy
    val empty = graft.engine.Scratch.dir("spec_dsv2_empty")
    new java.io.File(empty).mkdirs()
    val e = intercept[Exception] {
      spark.read.format("graft").load(empty).collect()
    }
    assert(e.getMessage.contains("MANIFEST") ||
      Option(e.getCause).exists(_.getMessage.contains("MANIFEST")), e.getMessage)
    // the write door is welded shut AT PLAN TIME: an overwrite through
    // the front door would otherwise delete the manifest and every
    // committed version before landing unmanifested parquet
    val w = intercept[Exception] {
      Seq((9L, "x", 0.0)).toDF("k", "tag", "bal")
        .write.format("graft").mode("overwrite").save(table)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(w).exists(m => m != null && m.contains("AtomicPublish")),
      s"write refusal must name the real write door: ${msgs(w)}")
    assert(spark.read.format("graft").load(table).count() === 4L,
      "a refused write must leave the table intact")
  }

  test("published index state via SQL text: kind-aware views match the ops read") {
    import graft.ops.{AtomicPublish, DedupIndex}
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") >= 100)
    val mh = graft.engine.Scratch.dir("spec_sql_idx_mh")
    DedupIndex.ensureMinHashIndex(spark, mh, corpus,
      s"$sfDir/documents.parquet", "doc_id>=100#sqlview", "doc_id", "text", 32, 8)
    DedupIndex.registerIndexViews(spark, mh, "spec_idx_mh")
    val viaSql = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(DISTINCT id) AS ids FROM spec_idx_mh")
      .collect().head
    val opsRows = AtomicPublish.read(spark, mh)
    assert(viaSql.getLong(0) === opsRows.count())
    assert(viaSql.getLong(1) === corpus.count())
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val vecs = emb.filter(col("vec_id") >= 100)
    val sem = graft.engine.Scratch.dir("spec_sql_idx_sem")
    DedupIndex.ensureSemanticIndex(spark, sem, vecs,
      s"$sfDir/embeddings.parquet", "vec_id>=100#sqlview", "vec_id", "e",
      dim = 64, corpusSize = vecs.count())
    DedupIndex.registerIndexViews(spark, sem, "spec_idx_sem")
    // cell-occupancy audit — the SQL question an operator actually asks
    // of index state, joinable against the centroid table
    val occ = spark.sql("""
      SELECT a.cell, COUNT(*) AS n FROM spec_idx_sem_assign a
      JOIN spec_idx_sem_model m ON a.cell = m.cell
      GROUP BY a.cell""").collect()
    assert(occ.map(_.getLong(1)).sum === vecs.count(),
      "assign view lost rows against the ops-API read")
  }
}
