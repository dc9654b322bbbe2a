package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

/** Handcrafted as-of semantics: backward inclusive match per key. */
class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("backward as-of picks latest right row at or before left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t("00:10:00")),
      (2L, 10L, t("00:00:30")),
      (3L, 20L, t("00:05:00")),
      (4L, 30L, t("00:05:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("00:01:00"), 101L),
      (10L, t("00:10:00"), 102L), // equal ts: inclusive match
      (20L, t("00:06:00"), 201L)) // after left: no match
      .toDF("user_id", "ts", "click_id")

    val out = AsOfJoin.backward(left, right, "user_id", "ts", Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(out === Map(
      1L -> 102L, // equal-ts right row wins (inclusive)
      2L -> -1L,  // before any click
      3L -> -1L,  // only later clicks exist
      4L -> -1L)) // key has no right rows at all
  }
}
