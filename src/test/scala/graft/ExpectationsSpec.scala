package graft

import org.apache.spark.sql.functions._
import graft.ops.{AtomicPublish, Expectations}
import graft.ops.Expectations.Expectation

/** Expectation semantics (NULL-hostile violation rule, stamp/split
  * accounting) and the table-integrated admission gate
  * (fail/drop/quarantine routing, persisted rule contract). */
class ExpectationsSpec extends SparkSpec {

  private val rules = Seq(
    Expectation("pos", "x > 0"),
    Expectation("named", "name IS NOT NULL"))

  private def sample = {
    import spark.implicits._
    Seq[(java.lang.Long, String)]((5L, "a"), (-1L, "b"), (null, "c"),
      (7L, null), (-2L, null))
      .toDF("x", "name")
  }

  test("stamp: false AND null both violate; clean rows stamp empty") {
    val out = Expectations.stamp(sample, rules)
      .select(col("x"), col(Expectations.ViolationsCol))
      .collect()
      .map(r => (if (r.isNullAt(0)) -99L else r.getLong(0)) -> r.getString(1))
      .toMap
    assert(out(5L) === "")
    assert(out(-1L) === "pos")
    assert(out(-99L) === "pos") // NULL x: predicate NULL = violation
    assert(out(7L) === "named")
    assert(out(-2L) === "pos,named") // rule declaration order
  }

  test("split partitions the batch exactly; counts agree in one pass") {
    val (clean, bad) = Expectations.split(sample, rules)
    assert(clean.count() === 1L)
    assert(bad.count() === 4L)
    assert(clean.columns.toSeq === sample.columns.toSeq,
      "clean side keeps the input schema")
    assert(bad.columns.contains(Expectations.ViolationsCol))
    val counts = Expectations.violationCounts(sample, rules)
    assert(counts === Map("pos" -> 3L, "named" -> 2L))
  }

  test("rule hygiene: duplicate names, empty sets, reserved chars refused") {
    intercept[IllegalArgumentException] {
      Expectations.stamp(sample, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Expectations.stamp(sample,
        Seq(Expectation("r", "x > 0"), Expectation("r", "x < 9")))
    }
    intercept[IllegalArgumentException] { Expectation("a,b", "x > 0") }
    intercept[IllegalArgumentException] { Expectation("t", "x\t> 0") }
  }

  test("set/get round-trips the table contract; set replaces") {
    val table = graft.engine.Scratch.dir("spec_expect_roundtrip")
    assert(Expectations.get(spark, table).isEmpty)
    Expectations.set(spark, table, rules)
    assert(Expectations.get(spark, table) === rules)
    val tighter = Seq(Expectation("pos", "x > 10"))
    Expectations.set(spark, table, tighter)
    assert(Expectations.get(spark, table) === tighter)
  }

  test("appendChecked: fail aborts loudly with per-rule counts, no rules is loud") {
    import spark.implicits._
    val table = graft.engine.Scratch.dir("spec_expect_fail")
    AtomicPublish.publish(spark, table)(p =>
      Seq((1L, "seed")).toDF("x", "name").write.parquet(p))
    val eNoRules = intercept[IllegalArgumentException] {
      Expectations.appendChecked(spark, table, sample)
    }
    assert(eNoRules.getMessage.contains("Expectations.set"), eNoRules.getMessage)
    Expectations.set(spark, table, rules)
    val eFail = intercept[IllegalStateException] {
      Expectations.appendChecked(spark, table, sample, mode = "fail")
    }
    assert(eFail.getMessage.contains("named×2") &&
      eFail.getMessage.contains("pos×3"), eFail.getMessage)
    assert(AtomicPublish.read(spark, table).count() === 1L,
      "fail mode must append nothing")
    // a clean batch in fail mode lands whole
    val st = Expectations.appendChecked(spark, table,
      Seq((2L, "ok"), (3L, "ok2")).toDF("x", "name"), mode = "fail")
    assert(st === Expectations.AdmitStats(2L, 0L))
    assert(AtomicPublish.read(spark, table).count() === 3L)
  }

  test("upsertChecked: the MERGE door honors the same contract") {
    import spark.implicits._
    val table = graft.engine.Scratch.dir("spec_expect_merge")
    AtomicPublish.publish(spark, table)(p =>
      Seq((1L, 10L, "old"), (2L, 20L, "keep")).toDF("k", "x", "name")
        .write.parquet(p))
    Expectations.set(spark, table, rules)
    // k=1 updates cleanly; k=3 inserts cleanly; k=2's update VIOLATES
    // (x<0) — it must quarantine and k=2's OLD value must stay live
    val batch = Seq((1L, 11L, "new"), (2L, -5L, "bad"), (3L, 30L, "ins"))
      .toDF("k", "x", "name")
    val st = Expectations.upsertChecked(spark, table, batch, Seq("k"))
    assert(st === Expectations.AdmitStats(2L, 1L))
    val rows = AtomicPublish.read(spark, table).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows === Map(1L -> (11L, "new"), 2L -> (20L, "keep"),
      3L -> (30L, "ins")), rows.toString)
    val quar = AtomicPublish.read(spark, Expectations.quarantinePath(table))
    assert(quar.count() === 1L)
    assert(quar.select(col(Expectations.ViolationsCol)).head.getString(0)
      === "pos")
    // fail mode refuses the whole merge
    val e = intercept[IllegalStateException] {
      Expectations.upsertChecked(spark, table,
        Seq((9L, -1L, "z")).toDF("k", "x", "name"), Seq("k"), mode = "fail")
    }
    assert(e.getMessage.contains("pos×1"), e.getMessage)
    assert(AtomicPublish.read(spark, table).count() === 3L)
  }

  test("appendChecked: quarantine routes both sides; drop counts the dropped") {
    import spark.implicits._
    val table = graft.engine.Scratch.dir("spec_expect_quar")
    AtomicPublish.publish(spark, table)(p =>
      Seq((1L, "seed")).toDF("x", "name").write.parquet(p))
    Expectations.set(spark, table, rules)
    val st = Expectations.appendChecked(spark, table, sample,
      mode = "quarantine")
    assert(st === Expectations.AdmitStats(1L, 4L))
    assert(AtomicPublish.read(spark, table).count() === 2L) // seed + 1 clean
    val quar = AtomicPublish.read(spark,
      Expectations.quarantinePath(table))
    assert(quar.count() === 4L)
    // quarantined rows carry WHY they were rejected
    val tags = quar.select(col(Expectations.ViolationsCol))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(tags === Seq("named", "pos", "pos", "pos,named"))
    // a second gated batch APPENDS to the quarantine (no replace)
    Expectations.appendChecked(spark, table,
      Seq[(java.lang.Long, String)]((-7L, "z")).toDF("x", "name"),
      mode = "quarantine")
    assert(AtomicPublish.read(spark,
      Expectations.quarantinePath(table)).count() === 5L)
    // drop mode: rejected counted, nothing new quarantined
    val st2 = Expectations.appendChecked(spark, table,
      Seq[(java.lang.Long, String)]((8L, "ok"), (-9L, "bad"))
        .toDF("x", "name"), mode = "drop")
    assert(st2 === Expectations.AdmitStats(1L, 1L))
    assert(AtomicPublish.read(spark,
      Expectations.quarantinePath(table)).count() === 5L)
    // a fully-CLEAN batch commits NOTHING to the quarantine — no empty
    // segment, no version bump; clean traffic must not grow the
    // quarantine manifest or pay its lock
    val qv = AtomicPublish.currentVersion(
      spark, Expectations.quarantinePath(table))
    val st3 = Expectations.appendChecked(spark, table,
      Seq((10L, "clean")).toDF("x", "name"), mode = "quarantine")
    assert(st3 === Expectations.AdmitStats(1L, 0L))
    assert(AtomicPublish.currentVersion(
      spark, Expectations.quarantinePath(table)) === qv)
  }
}
