package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.ConnexSplit

/** Leakage-freedom and proportion properties for the split family. */
class ConnexSplitSpec extends SparkSpec {

  test("connex split: rows sharing a key never straddle splits") {
    import spark.implicits._
    val split = ConnexSplit.connexSplit(
      Tables(spark, sfDir, "events").select($"event_id", $"user_id"),
      "event_id", Seq("user_id"), testPermille = 200, salt = 7L)
    val leaked = split.groupBy($"user_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(leaked === 0)
    // both splits are non-empty on this data
    assert(split.select("split").distinct().count() === 2)
  }

  test("connex split: transitive chains collapse into one component") {
    import spark.implicits._
    // a~b share k1, b~c share k2: all three must land together.
    val rows = Seq(
      (1L, "u1", "d1"), (2L, "u1", "d2"), (3L, "u9", "d2"),
      (4L, "u5", "d5")).toDF("id", "user", "device")
    val out = ConnexSplit.connexSplit(rows, "id", Seq("user", "device"),
      testPermille = 500, salt = 1L)
    val comps = out.select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === comps(2L) && comps(2L) === comps(3L))
    assert(comps(4L) !== comps(1L))
  }

  test("connex split is deterministic under repartitioning") {
    import spark.implicits._
    def run(parts: Int) = ConnexSplit.connexSplit(
        Tables(spark, sfDir, "events").select($"event_id", $"user_id")
          .repartition(parts),
        "event_id", Seq("user_id"), testPermille = 200, salt = 7L)
      .select("event_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(3) === run(11))
  }

  test("weighted folds balance row counts and never split a component") {
    import spark.implicits._
    val out = ConnexSplit.weightedFolds(
      Tables(spark, sfDir, "events").select($"event_id", $"user_id"),
      "event_id", Seq("user_id"), k = 4, salt = 7L)
    val leaked = out.groupBy($"user_id")
      .agg(countDistinct($"fold").as("f")).filter($"f" > 1).count()
    assert(leaked === 0)
    val loads = out.groupBy($"fold").count().collect()
      .map(r => r.getLong(1)).sorted
    assert(loads.length === 4)
    // sorted round-robin: folds within the largest component's size of
    // each other; this data's users are small, so demand tight balance.
    assert(loads.last - loads.head <= loads.last / 5,
      s"unbalanced folds: ${loads.mkString(",")}")
  }

  test("stratified split hits exact per-label proportions") {
    import spark.implicits._
    val out = ConnexSplit.stratifiedSplit(
      Tables(spark, sfDir, "documents"), "lang", 0.2, 7L, $"doc_id")
    val bad = out.groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(when($"split" === "test", 1).otherwise(0)).as("t"))
      .filter($"t" =!= ceil(lit(0.2) * $"n").cast("long")).count()
    assert(bad === 0)
  }
}
