package graft

import graft.queries.Registry

/** Property tests for the round-8 exact-moment statistics family:
  * groupby_skew_kurt (hi/lo-split integer power sums), autocorr,
  * outlier_zscore, expanding_stats, char_stats. Each is checked
  * against an independent driver-side computation on collected data —
  * the DuckDB oracle checks engine agreement; these check the MATH.
  */
class MomentStatsSpec extends SparkSpec {

  private def run(key: String) =
    Registry.all.find(_.key == key).get.build(spark, sfDir)

  test("groupby_skew_kurt matches a driver-side exact-moment computation") {
    val rows = run("groupby_skew_kurt").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val data = graft.engine.Tables(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.keySet === data.keySet)
    for ((et, vs) <- data) {
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(v => math.pow(v - mean, 2)).sum / n
      val m3 = vs.map(v => math.pow(v - mean, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - mean, 4)).sum / n
      val varSamp = m2 * n / (n - 1)
      val skew = math.sqrt(n * (n - 1)) / (n - 2) * (m3 / math.pow(m2, 1.5))
      val g2 = m4 / (m2 * m2) - 3.0
      val kurt = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
      val (gn, gvar, gskew, gkurt) = rows(et)
      assert(gn === vs.length)
      assert(math.abs(gvar - varSamp) / varSamp < 1e-9, s"$et var")
      assert(math.abs(gskew - skew) < 1e-9, s"$et skew")
      assert(math.abs(gkurt - kurt) < 1e-8, s"$et kurt")
    }
  }

  test("autocorr matches driver-side lag-1 Pearson") {
    val got = run("autocorr").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val byUser = graft.engine.Tables(spark, sfDir, "events")
      .filter("user_id < 40").select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val t = r.getTimestamp(1).toInstant
        (r.getLong(0), (t.getEpochSecond, t.getNano, r.getLong(2)), r.getDouble(3))
      }
      .groupBy(_._1)
    for ((uid, rows) <- byUser if got.contains(uid)) {
      val vs = rows.sortBy(_._2).map(_._3)
      val xs = vs.dropRight(1); val ys = vs.drop(1)
      // pairs are (x_i = value_i, y_i = previous value): graded op pairs
      // each row with its lag — same set either direction for Pearson.
      val n = xs.length.toDouble
      if (n >= 2) {
        val sx = xs.sum; val sy = ys.sum
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
        val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        if (den > 0) {
          val r = (n * sxy - sx * sy) / den
          assert(got(uid).isDefined, s"user $uid expected non-null")
          assert(math.abs(got(uid).get - r) < 1e-9, s"user $uid")
        }
      }
    }
  }

  test("outlier_zscore flags exactly the rows with |z| > 3 (population sd)") {
    val flagged = run("outlier_zscore").collect().map(_.getLong(0)).toSet
    val evs = graft.engine.Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val stats = evs.groupBy(_._2).view.mapValues { rows =>
      val vs = rows.map(_._3); val n = vs.length.toDouble
      val mean = vs.sum / n
      (mean, math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / n))
    }.toMap
    val expect = evs.filter { case (_, et, v) =>
      val (mean, sd) = stats(et)
      sd > 0 && math.abs(v - mean) / sd > 3.0
    }.map(_._1).toSet
    // boundary rows within float noise of |z| = 3 may differ; none here
    assert(flagged === expect)
  }

  test("expanding_stats running mean/max match a sequential fold") {
    val got = run("expanding_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val byUser = graft.engine.Tables(spark, sfDir, "events")
      .filter("user_id < 40").select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val t = r.getTimestamp(1).toInstant
        (r.getLong(0), (t.getEpochSecond, t.getNano, r.getLong(2)), r.getLong(2), r.getDouble(3))
      }.groupBy(_._1)
    for ((uid, rows) <- byUser) {
      val sorted = rows.sortBy(_._2)
      var sum = BigDecimal(0); var mx = Double.MinValue; var i = 0
      for ((_, _, eid, v) <- sorted) {
        i += 1; sum += BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        mx = math.max(mx, v)
        val (gm, gx) = got((uid, eid))
        assert(math.abs(gm - (sum.toDouble / i)) < 1e-9, s"user $uid row $i mean")
        assert(gx === mx, s"user $uid row $i max")
      }
    }
  }

  test("char_stats invariants: sum of freqs = n_chars, Simpson bounds, max_freq") {
    val docs = graft.engine.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    run("char_stats").collect().foreach { r =>
      val (id, nc, nd, coll, mf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val freqs = docs(id).groupBy(identity).map(_._2.length.toLong)
      assert(nc === docs(id).length.toLong)
      assert(nd === freqs.size.toLong)
      assert(coll === freqs.map(f => f * f).sum)
      assert(mf === freqs.max)
    }
  }
}
