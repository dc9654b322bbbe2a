package graft

import org.apache.spark.sql.functions._
import graft.ops.{AtomicPublish, MergeInto}

/** The SQL write surface of catalog-managed tables: INSERT INTO /
  * INSERT OVERWRITE / CTAS through the V1 write bridge,
  * UPDATE / DELETE / MERGE INTO through the GraftDmlRule extension —
  * merge-on-read when the table declares `merge.keys`, zone-pruned
  * copy-on-write when it doesn't — plus reconciled SELECTs over
  * pending-merge tables and the loud refusals for unsupported shapes. */
class SqlDmlSpec extends SparkSpec {

  private lazy val wh = {
    val dir = graft.engine.Scratch.dir("spec_sqldml_wh")
    spark.conf.set("spark.sql.catalog.dml_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dml_cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml_cat.db")
    dir
  }

  private def rows(sql: String): Seq[(Long, String)] =
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def msgs(x: Throwable): String =
    Option(x).map(t => t.getMessage + msgs(t.getCause)).getOrElse("")

  test("INSERT INTO appends a protocol commit; INSERT OVERWRITE publishes a new version") {
    wh
    spark.sql("CREATE TABLE dml_cat.db.ins (k BIGINT, v STRING)")
    spark.sql("INSERT INTO dml_cat.db.ins VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO dml_cat.db.ins SELECT 3L, 'c'")
    assert(rows("SELECT k, v FROM dml_cat.db.ins ORDER BY k") ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // create(1) + two appends
    assert(AtomicPublish.currentVersion(spark, s"$wh/db/ins").contains(3L))
    spark.sql("INSERT OVERWRITE dml_cat.db.ins VALUES (9, 'z')")
    assert(rows("SELECT k, v FROM dml_cat.db.ins") === Seq((9L, "z")))
    // the overwritten state is STILL time-travel readable (publish,
    // not delete)
    assert(rows("SELECT k, v FROM dml_cat.db.ins VERSION AS OF 3 ORDER BY k")
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("CTAS lands create + append; writeTo.overwrite(cond) is a partial replaceWhere") {
    import spark.implicits._
    wh
    spark.sql(
      "CREATE TABLE dml_cat.db.ctas AS SELECT id AS k, CAST(id AS STRING) AS v FROM range(4)")
    assert(spark.sql("SELECT count(*) FROM dml_cat.db.ctas").head.getLong(0) === 4L)
    // partial overwrite: only the k>=2 region is replaced
    Seq((2L, "two"), (3L, "three")).toDF("k", "v")
      .writeTo("dml_cat.db.ctas").overwrite($"k" >= 2)
    assert(rows("SELECT k, v FROM dml_cat.db.ctas ORDER BY k") ===
      Seq((0L, "0"), (1L, "1"), (2L, "two"), (3L, "three")))
    // a batch outside the predicate refuses (replaceWhere's contract)
    val e = intercept[Exception] {
      Seq((0L, "zero")).toDF("k", "v")
        .writeTo("dml_cat.db.ctas").overwrite($"k" >= 2)
    }
    assert(msgs(e).contains("do NOT satisfy the predicate"), msgs(e))
  }

  test("keyless DELETE and UPDATE are copy-on-write partial rewrites") {
    wh
    spark.sql("CREATE TABLE dml_cat.db.cow (k BIGINT, v STRING)")
    spark.sql("INSERT INTO dml_cat.db.cow VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql("DELETE FROM dml_cat.db.cow WHERE k IN (2, 4)")
    assert(rows("SELECT k, v FROM dml_cat.db.cow ORDER BY k") ===
      Seq((1L, "a"), (3L, "c")))
    spark.sql("UPDATE dml_cat.db.cow SET v = concat(v, '!') WHERE k = 3")
    assert(rows("SELECT k, v FROM dml_cat.db.cow ORDER BY k") ===
      Seq((1L, "a"), (3L, "c!")))
    // keyless: no merge sidecars ever appear (pure cow rewrites)
    val segs = AtomicPublish.currentSegments(spark, s"$wh/db/cow")
    assert(AtomicPublish.upsertSidecarsFor(spark, s"$wh/db/cow", segs).isEmpty)
  }

  test("keyed DELETE/UPDATE land merge-on-read segments; SELECT reconciles through the rule") {
    wh
    spark.sql(
      "CREATE TABLE dml_cat.db.keyed (k BIGINT, v STRING) TBLPROPERTIES ('merge.keys'='k')")
    spark.sql("INSERT INTO dml_cat.db.keyed VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("UPDATE dml_cat.db.keyed SET v = 'B' WHERE k = 2")
    // the update landed as an UPSERT segment (write ∝ matched rows) …
    val t = s"$wh/db/keyed"
    val afterUpdate = AtomicPublish.currentSegments(spark, t)
    assert(AtomicPublish.upsertSidecarsFor(spark, t, afterUpdate).nonEmpty)
    // … and SQL SELECT still reconciles (the pending-read expansion)
    assert(rows("SELECT k, v FROM dml_cat.db.keyed ORDER BY k") ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    spark.sql("DELETE FROM dml_cat.db.keyed WHERE v = 'a'")
    assert(rows("SELECT k, v FROM dml_cat.db.keyed ORDER BY k") ===
      Seq((2L, "B"), (3L, "c")))
    // UPDATE on a merge key refuses loudly (INSERT+DELETE, not UPDATE)
    val e = intercept[Exception] {
      spark.sql("UPDATE dml_cat.db.keyed SET k = 99 WHERE v = 'B'")
    }
    assert(msgs(e).contains("merge key"), msgs(e))
    // fold; the plain scan serves the same reconciled content
    MergeInto.compactMerged(spark, t)
    assert(rows("SELECT k, v FROM dml_cat.db.keyed ORDER BY k") ===
      Seq((2L, "B"), (3L, "c")))
  }

  test("MERGE INTO: upsert, full sync, matched-delete, insert-only") {
    wh
    spark.sql(
      "CREATE TABLE dml_cat.db.m (k BIGINT, v STRING) TBLPROPERTIES ('merge.keys'='k')")
    spark.sql("INSERT INTO dml_cat.db.m VALUES (1,'a'), (2,'b'), (3,'c')")
    // upsert: update 2, insert 4
    spark.sql("""MERGE INTO dml_cat.db.m t
                 USING (SELECT 2L AS k, 'B' AS v UNION ALL SELECT 4L, 'd') s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT k, v FROM dml_cat.db.m ORDER BY k") ===
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // full sync: table mirrors the source (1 and 3 deleted)
    spark.sql("""MERGE INTO dml_cat.db.m t
                 USING (SELECT 2L AS k, 'B2' AS v UNION ALL SELECT 5L, 'e') s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows("SELECT k, v FROM dml_cat.db.m ORDER BY k") ===
      Seq((2L, "B2"), (5L, "e")))
    // matched-delete: tombstone the keys the source names
    spark.sql("""MERGE INTO dml_cat.db.m t
                 USING (SELECT 5L AS k) s ON t.k = s.k
                 WHEN MATCHED THEN DELETE""")
    assert(rows("SELECT k, v FROM dml_cat.db.m ORDER BY k") ===
      Seq((2L, "B2")))
    // insert-only: existing key 2 skipped, new key 6 lands
    spark.sql("""MERGE INTO dml_cat.db.m t
                 USING (SELECT 2L AS k, 'dup' AS v UNION ALL SELECT 6L, 'f') s
                 ON t.k = s.k
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT k, v FROM dml_cat.db.m ORDER BY k") ===
      Seq((2L, "B2"), (6L, "f")))
  }

  test("MERGE refusals are loud and name the door") {
    wh
    spark.sql(
      "CREATE TABLE dml_cat.db.r (k BIGINT, v STRING) TBLPROPERTIES ('merge.keys'='k')")
    spark.sql("INSERT INTO dml_cat.db.r VALUES (1,'a')")
    // non-equi ON
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cat.db.r t USING (SELECT 1L AS k, 'x' AS v) s
                   ON t.k > s.k
                   WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(msgs(e1).contains("equi-predicates"), msgs(e1))
    // ON keys differ from the declared merge identity
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cat.db.r t USING (SELECT 'a' AS v) s
                   ON t.v = s.v
                   WHEN MATCHED THEN DELETE""")
    }
    assert(msgs(e2).contains("declared merge identity"), msgs(e2))
    // conditional matched clause
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cat.db.r t USING (SELECT 1L AS k, 'x' AS v) s
                   ON t.k = s.k
                   WHEN MATCHED AND s.v = 'x' THEN UPDATE SET *""")
    }
    assert(msgs(e3).toLowerCase.contains("condition") ||
      msgs(e3).contains("unsupported MERGE shape"), msgs(e3))
    // partial-column SET inside MERGE
    val e4 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cat.db.r t USING (SELECT 1L AS k, 'x' AS v) s
                   ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(msgs(e4).contains("whole-row") || msgs(e4).contains("covers only")
      || msgs(e4).contains("unsupported MERGE shape"), msgs(e4))
    // subquery DELETE predicate
    val e5 = intercept[Exception] {
      spark.sql("""DELETE FROM dml_cat.db.r
                   WHERE k IN (SELECT id FROM range(2))""")
    }
    assert(msgs(e5).contains("subquery"), msgs(e5))
  }

  test("merge.keys TBLPROPERTY is validated at CREATE and surfaced in properties") {
    wh
    val e = intercept[Exception] {
      spark.sql(
        "CREATE TABLE dml_cat.db.badkeys (k BIGINT) TBLPROPERTIES ('merge.keys'='nope')")
    }
    assert(msgs(e).contains("absent from the declared schema"), msgs(e))
    spark.sql(
      "CREATE TABLE dml_cat.db.goodkeys (k BIGINT, v STRING) TBLPROPERTIES ('merge.keys'='k')")
    val props = spark.sql("SHOW TBLPROPERTIES dml_cat.db.goodkeys").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("merge.keys").contains("k"))
  }

  test("SQL DML touches ONLY managed graft tables — a parquet temp view flows to Spark untouched") {
    import spark.implicits._
    wh
    val p = graft.engine.Scratch.dir("spec_sqldml_plain")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("plain_pq")
    // Spark's own error for non-v2 DELETE, not a graft refusal
    val e = intercept[Exception] {
      spark.sql("DELETE FROM plain_pq WHERE k = 1")
    }
    assert(!msgs(e).contains("graft"), msgs(e))
  }
}
