package graft

/** The bench artifact's validity gate and the pinned-materialize map's
  * staleness check — both protect the PERFORMANCE EVIDENCE, not the
  * results: a contaminated capture graded as a regression wastes a
  * round chasing environment noise, and a stale materialize pin
  * silently reverts a count()-eliminated key to hollow timing (the
  * exact failure the round-11 probe was added to prevent).
  */
class BenchGateSpec extends SparkSpec {

  test("invalid-capture gate: sibling JVMs and steal rate stamp the artifact invalid") {
    // a sibling JVM alive at start invalidates wall-clock timings
    assert(Bench.invalidReason(1, 0L, 100.0).exists(_.contains("sibling")))
    // steal above the documented ceiling (6 jiffies/s of wall — storms
    // measure 30-117/s, healthy boards 0.4-3/s) invalidates
    assert(Bench.invalidReason(0, 1000L, 100.0).exists(_.contains("steal")))
    // a healthy board passes (r13 quiet capture measured 2.9 jiffies/s
    // of wall with headliners at the quiet anchor)
    assert(Bench.invalidReason(0, 300L, 100.0).isEmpty)
    // probe-unavailable sentinels (-1) must not false-positive
    assert(Bench.invalidReason(-1, 0L, 100.0).isEmpty)
    assert(Bench.invalidReason(0, -1L, 100.0).isEmpty)
  }

  test("pinned materialize verdicts match the live count-elimination probe") {
    // Each pinned key skips the bench's runtime probe (eager builders
    // would run their whole pipeline once extra and pre-warm memoized
    // fits); this RE-DERIVES every verdict from the key's live plans
    // and fails when a pin has gone stale — e.g. a query edit that
    // makes a pinned-false key count()-eliminated would otherwise
    // silently hand the bench a hollow plan to time.
    val qs = SparkEntry.queries
    Bench.pinnedMaterialize.foreach { case (key, pinned) =>
      assert(qs.contains(key), s"pinned key $key no longer registered")
      val live = Bench.countEliminationProbe(qs(key)(spark, sfDir))
      assert(live === pinned,
        s"stale materialize pin for $key: pinned=$pinned but the live " +
          s"count() plan ${if (live) "DOES" else "does NOT"} eliminate a leaf scan")
    }
  }
}
