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

  private def run(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "click_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

  test("allow_exact_matches=false skips the equal-ts row (both directions)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t("00:10:00")),  // strict backward -> 101 (not the equal-ts 102)
      (2L, 10L, t("00:01:00"))). // strict backward -> none (only row IS equal-ts)
      toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("00:01:00"), 101L),
      (10L, t("00:10:00"), 102L))
      .toDF("user_id", "ts", "click_id")

    val bwd = run(AsOfJoin.backward(left, right, "user_id", "ts",
      Seq("click_id"), allowExactMatches = false))
    assert(bwd === Map(1L -> 101L, 2L -> -1L))

    val fwd = run(AsOfJoin.forward(left, right, "user_id", "ts",
      Seq("click_id"), allowExactMatches = false))
    // strictly-after: probe@00:10 has nothing later; probe@00:01 -> 102
    assert(fwd === Map(1L -> -1L, 2L -> 102L))
  }

  test("tolerance nulls matches older than the bound, keeps fresh ones") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t("00:10:00")),  // gap 9m  > 5m tolerance -> null
      (2L, 10L, t("00:04:00")),  // gap 3m <= 5m          -> 101
      (3L, 20L, t("00:05:00"))). // no right rows at all   -> null
      toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("00:01:00"), 101L))
      .toDF("user_id", "ts", "click_id")

    val out = run(AsOfJoin.backward(left, right, "user_id", "ts",
      Seq("click_id"), toleranceUs = Some(5L * 60 * 1000000)))
    assert(out === Map(1L -> -1L, 2L -> 101L, 3L -> -1L))

    // forward mirror: tolerance bounds right.ts - left.ts
    val fwd = run(AsOfJoin.forward(left, right, "user_id", "ts",
      Seq("click_id"), toleranceUs = Some(5L * 60 * 1000000)))
    // probe@00:10 & @00:05: nothing later; probe@00:04: 101 is EARLIER, not forward
    assert(fwd === Map(1L -> -1L, 2L -> -1L, 3L -> -1L))
  }

  test("null-payload right row advances the match (no ts/payload desync)") {
    import spark.implicits._
    // The latest right row before the probe has a NULL payload. Pandas
    // merge_asof matches ROWS, so the result is that row's null payload —
    // not the older row's 101. With a tolerance, the matched ts must be
    // the null-payload row's ts (fresh => match kept, as null).
    val left = Seq(
      (1L, 10L, t("00:10:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("00:01:00"), Some(101L)),
      (10L, t("00:09:00"), None: Option[Long])) // latest match, null payload
      .toDF("user_id", "ts", "click_id")

    val plain = run(AsOfJoin.backward(left, right, "user_id", "ts", Seq("click_id")))
    assert(plain === Map(1L -> -1L))

    // 2-minute tolerance: the 00:09 row is within bound; if the carry
    // desynced (ts from 00:09, payload from 00:01) the old code kept
    // 101 here even though the row that matched has a null payload.
    val tol = run(AsOfJoin.backward(left, right, "user_id", "ts",
      Seq("click_id"), toleranceUs = Some(2L * 60 * 1000000)))
    assert(tol === Map(1L -> -1L))
  }

  test("ts in rightCols is rejected") {
    import spark.implicits._
    val df = Seq((10L, t("00:01:00"), 1L)).toDF("user_id", "ts", "click_id")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df, "user_id", "ts", Seq("ts", "click_id"))
    }
  }

  test("reserved __m_ts and dotted payload names are rejected") {
    import spark.implicits._
    // A payload literally named __m_ts would collide with the carry
    // struct's match-ts field and silently corrupt the tolerance check.
    val clash = Seq((10L, t("00:01:00"), 1L)).toDF("user_id", "ts", "__m_ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(clash, clash, "user_id", "ts", Seq("__m_ts"))
    }
    val dotted = Seq((10L, t("00:01:00"), 1L)).toDF("user_id", "ts", "click.id")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(dotted, dotted, "user_id", "ts", Seq("click.id"))
    }
  }

  test("dotted and internal-name LEFT payload columns are rejected too") {
    import spark.implicits._
    val right = Seq((10L, t("00:01:00"), 1L)).toDF("user_id", "ts", "click_id")
    // A left payload column containing '.' mis-parses as a nested-field
    // path in the internal col(c) references (left is never validated by
    // the rightCols checks above).
    val dottedLeft = Seq((1L, 10L, t("00:10:00")))
      .toDF("event.id", "user_id", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(dottedLeft, right, "user_id", "ts", Seq("click_id"))
    }
    // Internal working names on the left collide with the tag/carry
    // columns added during the union+window pass.
    for (bad <- Seq("__tag", "__c", "__r_click_id")) {
      val clashLeft = Seq((1L, 10L, t("00:10:00"))).toDF(bad, "user_id", "ts")
      intercept[IllegalArgumentException] {
        AsOfJoin.backward(clashLeft, right, "user_id", "ts", Seq("click_id"))
      }
    }
  }

  test("strict + tolerance compose (pandas merge_asof parity)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t("00:06:00"))). // equal-ts 106 excluded; 101@00:03 within 5m
      toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("00:03:00"), 101L),
      (10L, t("00:06:00"), 106L))
      .toDF("user_id", "ts", "click_id")

    val out = run(AsOfJoin.backward(left, right, "user_id", "ts",
      Seq("click_id"), allowExactMatches = false,
      toleranceUs = Some(5L * 60 * 1000000)))
    assert(out === Map(1L -> 101L))
  }
}
