package graft

import graft.ops.AtomicPublish

/** The SQL utility surface (graft.plans.GraftSqlParser +
  * the `table_changes` TVF): VACUUM / OPTIMIZE / RESTORE / DESCRIBE
  * HISTORY as SQL text over catalog names and quoted paths, the loud
  * refusals for foreign catalogs and malformed TVF calls, and — the
  * wrapper's prime directive — that every statement the grammar does
  * NOT own still parses exactly as Spark would. */
class SqlUtilitySpec extends SparkSpec {

  private lazy val wh = {
    val dir = graft.engine.Scratch.dir("spec_sqlutil_wh")
    spark.conf.set("spark.sql.catalog.util_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.util_cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS util_cat.db")
    dir
  }

  private def msgs(x: Throwable): String =
    Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")

  test("DESCRIBE HISTORY / OPTIMIZE / RESTORE / VACUUM drive the protocol by name") {
    wh
    spark.sql("CREATE TABLE util_cat.db.hist (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('merge.keys'='k')")
    spark.sql("INSERT INTO util_cat.db.hist VALUES (1,'a'), (2,'b')")
    spark.sql("MERGE INTO util_cat.db.hist t " +
      "USING (SELECT 2L AS k, 'b2' AS v) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val opt = spark.sql("OPTIMIZE util_cat.db.hist").collect()(0)
    assert(opt.getString(1) === "COMPACT" && opt.getString(2) === "COMPACTED")
    val hist = spark.sql("DESCRIBE HISTORY util_cat.db.hist")
      .select("version", "operation", "is_fold")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(hist.toSeq === Seq((1L, "PUBLISH", false), (2L, "APPEND", false),
      (3L, "MERGE", false), (4L, "OPTIMIZE", true)))
    val restored = spark.sql(
      "RESTORE TABLE util_cat.db.hist TO VERSION AS OF 2").collect()(0)
    assert(restored.getLong(1) === 2L && restored.getLong(2) === 5L)
    assert(spark.sql("SELECT v FROM util_cat.db.hist WHERE k = 2")
      .head.getString(0) === "b")
    // the fold left superseded dirs; VACUUM RETAIN 0 HOURS reaps them
    // — and restores any pre-set retention conf afterwards
    spark.conf.set(AtomicPublish.RetentionMsKey, "123456")
    val vac = spark.sql("VACUUM util_cat.db.hist RETAIN 0 HOURS").collect()(0)
    assert(vac.getLong(1) > 0L, s"vacuum deleted nothing: $vac")
    assert(spark.conf.get(AtomicPublish.RetentionMsKey) === "123456")
    spark.conf.unset(AtomicPublish.RetentionMsKey)
  }

  test("quoted-path targets address the protocol directly") {
    import spark.implicits._
    val t = graft.engine.Scratch.dir("spec_sqlutil_path")
    AtomicPublish.publish(spark, t)(p =>
      Seq((1L, "a")).toDF("k", "v").write.parquet(p))
    AtomicPublish.appendSegment(spark, t)(p =>
      Seq((2L, "b")).toDF("k", "v").write.parquet(p))
    val hist = spark.sql(s"DESCRIBE HISTORY '$t'").collect()
    assert(hist.map(_.getString(1)).toSeq === Seq("PUBLISH", "APPEND"))
    val opt = spark.sql(s"OPTIMIZE '$t' ZORDER BY (k)").collect()(0)
    assert(opt.getString(2) === "COMPACTED")
    assert(spark.sql(s"VACUUM '$t' RETAIN 0 HOURS").collect()(0)
      .getLong(1) > 0L)
  }

  test("foreign catalogs and unresolvable names refuse loudly") {
    wh
    val e = intercept[Exception] {
      spark.sql("VACUUM spark_catalog.default.sometable").collect()
    }
    assert(msgs(e).contains("not a graft catalog"), msgs(e))
    val e2 = intercept[Exception] {
      spark.sql("OPTIMIZE util_cat.db.never_created").collect()
    }
    assert(msgs(e2).toLowerCase.contains("table"), msgs(e2))
  }

  test("the wrapper never claims statements it does not own") {
    wh
    // a temp view literally named `history` still DESCRIBEs as Spark
    spark.range(3).createOrReplaceTempView("history")
    assert(spark.sql("DESCRIBE history").count() > 0)
    // ordinary SQL parses untouched through the delegating parser
    assert(spark.sql("SELECT 1 AS one").head.getInt(0) === 1)
    // garbage is still a PARSE error, not a graft error
    val e = intercept[Exception] { spark.sql("FROBNICATE the database") }
    assert(e.getClass.getName.toLowerCase.contains("parse"), e.toString)
  }

  test("table_changes TVF: literal args only, exact arity") {
    wh
    spark.sql("CREATE TABLE util_cat.db.cdf (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('merge.keys'='k')")
    spark.sql("INSERT INTO util_cat.db.cdf VALUES (1,'a')")
    val changes = spark.sql(
      "SELECT k, v, _change_type FROM " +
        "table_changes('util_cat.db.cdf', 1, 2)").collect()
    assert(changes.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq === Seq((1L, "a", "insert")))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('util_cat.db.cdf', 1)")
    }
    assert(msgs(e).contains("exactly 3"), msgs(e))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('util_cat.db.cdf', rand(), 2)")
    }
    assert(msgs(e2).contains("literal"), msgs(e2))
  }
}
