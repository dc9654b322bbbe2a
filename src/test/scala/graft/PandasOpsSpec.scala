package graft

import graft.queries.Registry
import org.apache.spark.sql.Row

/** Semantic gates for the round-7 pandas-surface ops beyond what the
  * DuckDB oracle proves (the oracle pins Spark==DuckDB on the same
  * formula; these pin the formula itself against an independent
  * reference implementation).
  */
class PandasOpsSpec extends SparkSpec {

  test("ewm_mean matches the exact unbounded recurrence to ~2^-32") {
    // Reference: pandas ewm(alpha=0.5, adjust=True).mean() — the
    // textbook weighted form, computed sequentially per key in exact
    // order. The graded op truncates the lookback at 32 observations;
    // with alpha=0.5 the dropped tail carries < 2^-32 of the weight, so
    // relative error must stay below ~1e-9 on positive inputs.
    val events = graft.engine.Tables(spark, sfDir, "events")
      .filter("user_id < 20")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .groupBy(_.getLong(0))
    val expect = events.toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy { r =>
        val t = r.getTimestamp(2).toInstant
        (t.getEpochSecond, t.getNano, r.getLong(1))
      }
      var num = 0.0
      var den = 0.0
      sorted.map { r =>
        num = num / 2.0 + r.getDouble(3)
        den = den / 2.0 + 1.0
        (uid, r.getLong(1)) -> num / den
      }
    }.toMap
    val got = Registry.byKey("ewm_mean").build(spark, sfDir).collect()
    assert(got.length === expect.size)
    got.foreach { case Row(uid: Long, eid: Long, ewm: Double) =>
      val ref = expect((uid, eid))
      assert(math.abs(ewm - ref) <= math.abs(ref) * 1e-8 + 1e-12,
        s"user $uid event $eid: got $ewm want $ref")
    }
  }

  test("rolling_median matches a scala reference on the 7-row frame") {
    // pandas rolling(7).median() DEFAULT semantics: min_periods = 7, so
    // the first 6 rows of each key are NaN → NULL.
    val events = graft.engine.Tables(spark, sfDir, "events")
      .filter("user_id < 20")
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .groupBy(_.getLong(0))
    val expect = events.toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy { r =>
        val t = r.getTimestamp(2).toInstant
        (t.getEpochSecond, t.getNano, r.getLong(1))
      }
      sorted.zipWithIndex.map { case (r, i) =>
        val frame = sorted.slice(math.max(0, i - 6), i + 1).map(_.getDouble(3)).sorted
        val n = frame.length
        val med: Option[Double] =
          if (n < 7) None
          else if (n % 2 == 1) Some(frame(n / 2))
          else Some((frame(n / 2 - 1) + frame(n / 2)) / 2.0)
        (uid, r.getLong(1)) -> med
      }
    }.toMap
    val got = Registry.byKey("rolling_median").build(spark, sfDir).collect()
    assert(got.length === expect.size)
    assert(got.exists(_.isNullAt(2)), "partial leading frames must be NULL")
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val want = expect(key)
      if (r.isNullAt(2)) assert(want.isEmpty, s"$key: got NULL want $want")
      else assert(want.contains(r.getDouble(2)), s"$key: got ${r.getDouble(2)} want $want")
    }
  }

  test("rolling_quantile matches the pandas linear-interpolation formula") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // rolling(4, min_periods=1).quantile(0.25): pos = (n-1)/4 walks
    // 0, 0.25, 0.5, 0.75 across the growing frame {1..n}.
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0))
      .toDF("k", "seq", "v")
    val got = graft.ops.RollingOps.rollingQuantile(
        df, "v", 4, 0.25, Seq(col("k")), Seq(col("seq")))
      .orderBy("seq").select("roll_quantile").collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(1.0, 1.25, 1.5, 1.75))
  }

  test("rolling_median skips nulls like pandas (skipna + min_periods count)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key 1: values 1,null,3,5 with rolling(3, min_periods=2):
    //   row1: frame {1}            → 1 non-null < 2  → NULL
    //   row2: frame {1,null}       → 1 non-null < 2  → NULL
    //   row3: frame {1,null,3}     → 2 non-null      → median(1,3) = 2.0
    //   row4: frame {null,3,5}     → 2 non-null      → median(3,5) = 4.0
    val df = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, None),
      (1L, 3L, Some(3.0)), (1L, 4L, Some(5.0))
    ).toDF("k", "seq", "v")
    val got = graft.ops.RollingOps.rollingMedian(
        df, "v", 3, Seq(col("k")), Seq(col("seq")), minPeriods = 2)
      .orderBy("seq").select("roll_median").collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0))
    assert(got(2).getDouble(0) === 2.0)
    assert(got(3).getDouble(0) === 4.0)
  }

  test("StreamFrame veneer exposes ewm/rolling-median/rolling-corr/sessionize") {
    import org.apache.spark.sql.functions.col
    val sf = new graft.engine.StreamFrame(
      graft.engine.Tables(spark, sfDir, "events").filter("user_id < 20"))
    val keys = Seq(col("user_id"))
    val ord = Seq(col("ts"), col("event_id"))
    assert(sf.ewmMean("value", keys, ord).toDF().columns.contains("ewm"))
    assert(sf.rollingMedian("value", 7, keys, ord).toDF().columns.contains("roll_median"))
    assert(sf.rollingQuantile("value", 7, 0.25, keys, ord).toDF()
      .columns.contains("roll_quantile"))
    assert(sf.rollingTrendCorr("value", keys, ord).toDF().columns.contains("roll_trend"))
    val sess = sf.sessionize("ts", 1800L, keys, ord).toDF()
    assert(sess.columns.contains("session_id") && sess.count() > 0)
  }

  test("sessionize: same-session gaps <= 30min, cross-session gaps > 30min") {
    val rows = Registry.byKey("sessionize").build(spark, sfDir)
      .join(graft.engine.Tables(spark, sfDir, "events").select("event_id", "ts"),
        "event_id")
      .select("user_id", "event_id", "session_id", "ts")
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy { r =>
        val t = r.getTimestamp(3).toInstant
        (t.getEpochSecond, t.getNano, r.getLong(1))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getTimestamp(3).getTime - a.getTimestamp(3).getTime
          val sameSession = a.getLong(2) == b.getLong(2)
          // 1ms slack on the boundary: getTime truncates sub-ms
          if (gapMs > 30 * 60 * 1000 + 1) assert(!sameSession)
          if (gapMs + 1 < 30 * 60 * 1000) assert(sameSession)
        case _ => ()
      }
      // session ids are 1..k dense in time order
      assert(sorted.head.getLong(2) === 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) === 0L
            || b.getLong(2) - a.getLong(2) === 1L)
        case _ => ()
      }
    }
  }
}
