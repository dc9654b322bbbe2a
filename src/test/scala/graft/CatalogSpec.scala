package graft

import org.apache.spark.sql.functions._
import graft.ops.{AtomicPublish, MergeInto}

/** Name-resolved SQL surface of the GraftCatalog plugin: namespace and
  * table DDL, SELECT by name (same plan as the path door), SQL-standard
  * time travel, SHOW TABLES, the welded write door, drop/rename. */
class CatalogSpec extends SparkSpec {

  private lazy val wh = {
    val dir = graft.engine.Scratch.dir("spec_catalog_wh")
    spark.conf.set("spark.sql.catalog.spec_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spec_cat.warehouse", dir)
    dir
  }

  test("namespaces, CREATE TABLE, name-resolved reads, SHOW TABLES") {
    import spark.implicits._
    wh
    spark.sql("CREATE NAMESPACE spec_cat.db1")
    assert(spark.sql("SHOW NAMESPACES IN spec_cat").collect()
      .map(_.getString(0)).contains("db1"))
    // CREATE TABLE = one real protocol commit of an empty segment
    spark.sql("CREATE TABLE spec_cat.db1.t (k BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM spec_cat.db1.t").count() === 0L)
    assert(AtomicPublish.currentVersion(spark, s"$wh/db1/t").contains(1L))
    // fill through the protocol door; the name sees the new commit
    AtomicPublish.appendSegment(spark, s"$wh/db1/t")(p =>
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(p))
    assert(spark.sql("SELECT * FROM spec_cat.db1.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // SHOW TABLES lists only PUBLISHED directories
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$wh/db1/not_a_table"))
    assert(spark.sql("SHOW TABLES IN spec_cat.db1").collect()
      .map(_.getString(1)).toSet === Set("t"))
    // name resolution and the path door build the SAME read
    val byPath = spark.read.format("graft").load(s"$wh/db1/t")
    assert(byPath.orderBy($"k").collect().toSeq ===
      spark.sql("SELECT * FROM spec_cat.db1.t ORDER BY k").collect().toSeq)
  }

  test("SQL-standard time travel: VERSION AS OF and TIMESTAMP AS OF") {
    import spark.implicits._
    wh
    spark.sql("CREATE NAMESPACE spec_cat.db2")
    val t = s"$wh/db2/tt"
    AtomicPublish.publish(spark, t)(p =>
      Seq((1L, "v1")).toDF("k", "v").write.parquet(p))
    Thread.sleep(1200) // coarse-mtime clock for the wall-clock clause
    val cut = java.time.Instant.now().toString
    Thread.sleep(1200)
    AtomicPublish.appendSegment(spark, t)(p =>
      Seq((2L, "v2")).toDF("k", "v").write.parquet(p))
    assert(spark.sql("SELECT count(*) FROM spec_cat.db2.tt").head.getLong(0) === 2L)
    assert(spark.sql("SELECT v FROM spec_cat.db2.tt VERSION AS OF 1")
      .head.getString(0) === "v1")
    assert(spark.sql(
      s"SELECT count(*) FROM spec_cat.db2.tt TIMESTAMP AS OF '$cut'")
      .head.getLong(0) === 1L)
    // a merge-on-read table RECONCILES by name (the DML rule expands
    // the placeholder relation into the readOver plan) — the raw PATH
    // scan still refuses
    MergeInto.upsertInto(spark, t, Seq((1L, "v1b")).toDF("k", "v"), Seq("k"))
    assert(spark.sql(
      "SELECT v FROM spec_cat.db2.tt WHERE k = 1").head.getString(0) === "v1b")
    assert(spark.sql("SELECT count(*) FROM spec_cat.db2.tt")
      .head.getLong(0) === 2L)
    val e = intercept[Exception] {
      spark.read.format("graft").load(t).collect()
    }
    def msgs(x: Throwable): String =
      Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")
    assert(msgs(e).contains("merge-on-read"), msgs(e))
  }

  test("identifiers are single path components — traversal cannot escape the warehouse") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spec_cat.dbsafe")
    def msgs(x: Throwable): String =
      Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")
    // a crafted table name must refuse, not resolve outside the warehouse
    val cat = spark.sessionState.catalogManager.catalog("spec_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val evil = Seq("../escape", "a/b", "..", ".")
    evil.foreach { name =>
      val e = intercept[IllegalArgumentException] {
        cat.createTable(Identifier.of(Array("dbsafe"), name),
          new org.apache.spark.sql.types.StructType()
            .add("k", org.apache.spark.sql.types.LongType),
          Array.empty, new java.util.HashMap[String, String]())
      }
      assert(msgs(e).contains("single path components"), s"$name: ${msgs(e)}")
    }
    // same guard on the namespace side
    val eNs = intercept[IllegalArgumentException] {
      cat.createNamespace(Array("../up"), new java.util.HashMap[String, String]())
    }
    assert(msgs(eNs).contains("single path components"), msgs(eNs))
  }

  test("the PATH write door stays welded; catalog writes land as protocol commits; drop and rename are catalog ops") {
    import spark.implicits._
    wh
    spark.sql("CREATE NAMESPACE spec_cat.db3")
    spark.sql("CREATE TABLE spec_cat.db3.w (k BIGINT)")
    // the catalog door WRITES now: INSERT INTO = one append commit
    spark.sql("INSERT INTO spec_cat.db3.w VALUES (1), (2)")
    assert(spark.sql("SELECT count(*) FROM spec_cat.db3.w")
      .head.getLong(0) === 2L)
    assert(AtomicPublish.currentVersion(spark, s"$wh/db3/w").contains(2L))
    // CTAS = createTable + append through the same protocol door
    spark.sql("CREATE TABLE spec_cat.db3.w2 AS SELECT 7L AS k")
    assert(spark.sql("SELECT k FROM spec_cat.db3.w2").head.getLong(0) === 7L)
    spark.sql("DROP TABLE spec_cat.db3.w2")
    // the PATH door refuses writes exactly as before (address ≠ ownership)
    def msgs(x: Throwable): String =
      Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")
    val ePath = intercept[Exception] {
      Seq(1L).toDF("k").write.format("graft").mode("append")
        .save(s"$wh/db3/w")
    }
    assert(msgs(ePath).contains("READ door"), msgs(ePath))
    // rename within the namespace, then drop
    spark.sql("ALTER TABLE spec_cat.db3.w RENAME TO db3.w_renamed")
    assert(spark.sql("SHOW TABLES IN spec_cat.db3").collect()
      .map(_.getString(1)).toSet === Set("w_renamed"))
    spark.sql("DROP TABLE spec_cat.db3.w_renamed")
    assert(spark.sql("SHOW TABLES IN spec_cat.db3").collect().isEmpty)
    // drop a non-empty namespace needs CASCADE
    spark.sql("CREATE TABLE spec_cat.db3.keep (k BIGINT)")
    val eDrop = intercept[Exception] {
      spark.sql("DROP NAMESPACE spec_cat.db3")
    }
    assert(msgs(eDrop).toLowerCase.contains("empty"), msgs(eDrop))
    spark.sql("DROP NAMESPACE spec_cat.db3 CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN spec_cat").collect()
      .map(_.getString(0)).contains("db3"))
  }
}
