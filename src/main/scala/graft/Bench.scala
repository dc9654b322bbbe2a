package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Times `count()` on every declared query at
  * SPARK_GRAFT_SF_DIR (default sf0.1), n iterations each (best-of-n so a
  * one-off GC pause or compile stall can't masquerade as a regression).
  *
  * Output contract: stdout carries ONE short JSON line (total +
  * headline queries only, well under 1 kB) and nothing else — the
  * round-4 driver capture was byte-truncated mid-stream, so any extra
  * stdout (the old full per-query println) can push the summary past
  * the capture limit and null the round's perf signal. The full
  * per-query map goes to bench_details.json only. Failed queries are
  * listed in `failed` (and excluded from the total) instead of being
  * silently timed as fast successes. Every timed key also records its
  * own steal-jiffies delta and post-key loadavg (`queries_steal` /
  * `queries_load`) so contended keys self-identify individually.
  */
object Bench {
  // Queries the summary line carries explicitly (≈BASELINE.md headliners).
  private val headline = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "top_k", "window_rank",
    "stream_tumbling", "sim_search", "median", "join_bucketed",
    "dedup_exact", "groupby_agg")

  /** 1-min load average, or -1 where /proc is unavailable. */
  private def loadAvg(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative CPU-steal jiffies (/proc/stat cpu col 8), or -1. A VM
    * host that steals cycles inflates wall-clock with loadavg low and
    * zero sibling JVMs — the one contention mode the other stamps can't
    * see (observed: keys at 30× with siblings=0, load<2, while the
    * steal counter jumped). The start/end delta lets any reader rule
    * host noise in or out without re-running.
    */
  private def stealJiffies(): Long =
    try {
      val cpu = Files.readString(Paths.get("/proc/stat")).linesIterator
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      cpu(8).toLong
    } catch { case _: Throwable => -1L }

  /** (other java processes, of which actively burning CPU over a 250 ms
    * window). Three rounds of driver-captured bench signal were lost to
    * box contention that only a later quiet re-run could prove — so the
    * artifact now carries its own validity evidence: any reader can
    * adjudicate a suspicious total without re-running.
    *
    * ANCESTOR JVMs are excluded (round 14): a capture invoked through an
    * sbt/CI wrapper has its own mostly-idle parent java process in the
    * table for the entire run — the r13 driver capture stamped itself
    * invalid on exactly that ("1 sibling JVM(s) alive at start") while
    * its numbers bracketed the quiet board. The invoker is part of how
    * the capture runs, not a contender; genuinely racing JVMs are never
    * in the ancestor chain.
    */
  private def siblingJvms(): (Int, Int) = try {
    val self = ProcessHandle.current().pid().toString
    val ancestors: Set[String] = {
      val b = Set.newBuilder[String]
      var h = ProcessHandle.current().parent()
      while (h.isPresent) { b += h.get().pid().toString; h = h.get().parent() }
      b.result()
    }
    def pids: Seq[String] = new java.io.File("/proc").list().toSeq
      .filter(p => p.nonEmpty && p.forall(_.isDigit) && p != self &&
        !ancestors.contains(p))
      .filter { p =>
        try Files.readString(Paths.get(s"/proc/$p/comm")).trim == "java"
        catch { case _: Throwable => false }
      }
    // utime+stime jiffies from /proc/<pid>/stat; comm may contain spaces,
    // so split after the closing paren.
    def cpu(p: String): Long =
      try {
        val stat = Files.readString(Paths.get(s"/proc/$p/stat"))
        val f = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
        f(11).toLong + f(12).toLong // utime+stime (fields 14,15 1-based)
      } catch { case _: Throwable => 0L }
    val before = pids.map(p => p -> cpu(p)).toMap
    Thread.sleep(250)
    val busy = before.count { case (p, c0) => cpu(p) > c0 }
    (before.size, busy)
  } catch { case _: Throwable => (-1, -1) }

  /** Pinned materialize verdicts for EAGER-BUILDER keys (see the probe
    * comment in main): true = count() would eliminate the operator so
    * the bench times toRdd.count of the key's own plan; false = the
    * plan survives count() and keeps count() timing. Object-level and
    * package-visible because BenchGateSpec RE-DERIVES each verdict from
    * the live plans and fails when a pin goes stale — the failure mode
    * where an edited query's count() plan becomes eliminated and the
    * bench silently reverts to hollow timing. */
  private[graft] val pinnedMaterialize = Map(
    "dedup_semantic_blocked" -> false,
    "dedup_incremental" -> true,
    "dedup_incremental_minhash" -> true,
    "dedup_incremental_indexed" -> true,
    "dedup_incremental_minhash_indexed" -> true,
    "dedup_incremental_minhash_cycle" -> true,
    "dedup_incremental_cycle" -> true,
    "dedup_incremental_minhash_lsm" -> true,
    // true since the round-16 single-pass recall rewrite: the verdict's
    // left join lets count() eliminate the candidate leaf scan, so the
    // bench must materialize these keys' own plans to time the real
    // work (the unpinned recall keys re-probe live and switch the same
    // way automatically)
    "sim_search_ivf_indexed" -> true,
    "sim_search_ivf_cycle" -> true,
    // eager builders (publish + MERGE / fold / appends at build time);
    // their aggregate or reconciled-read tails survive count(), but
    // the probe would re-run the whole commit cycle untimed — pin
    "published_table_sql" -> false,
    "snapshot_read" -> false,
    "scan_manifest_pruned" -> false,
    "merge_upsert_evolved" -> false)

  /** The count-elimination probe: does `df.groupBy().count()` drop a
    * leaf scan vs the key's own optimized plan? Shared by main and the
    * BenchGateSpec pin-staleness check. */
  private[graft] def countEliminationProbe(
      df: org.apache.spark.sql.DataFrame): Boolean =
    df.groupBy().count().queryExecution.optimizedPlan.collectLeaves().size <
      df.queryExecution.optimizedPlan.collectLeaves().size

  /** Documented contamination ceiling: host-steal jiffies per WALL
    * second above which a capture is stamped invalid. Calibration from
    * this box's history: healthy accepted boards measure 0.4-3 /s of
    * wall (steal on this host correlates with the bench's OWN load, so
    * a full board under 32 threads shows a few jiffies/s even when the
    * 20 s idle pre-gate read 0-1 — the r13 board at 2.9/s had every
    * non-streaming key at per-key steal 0-4 and headliners at the
    * quiet anchor), while genuine contamination storms measure
    * 30-117 /s and inflate keys 5-30×. The per-key `queries_steal` map
    * remains the fine-grained signal for salvaging individual keys. */
  private[graft] val MaxStealPerSec = 6.0

  /** Is a single run's steal delta benign for its wall time? Absolute
    * floor of 4 jiffies (the healthy per-key reading on accepted
    * boards; one jiffy is 10 ms, so sub-second keys trip a pure rate
    * gate on measurement noise) OR the documented [[MaxStealPerSec]]
    * rate for longer keys. */
  private[graft] def quietRun(stealDelta: Long, sec: Double): Boolean =
    stealDelta < 0 || // no steal counter on this box: no evidence to act on
      (sec > 0 && (stealDelta <= 4 || stealDelta / sec <= MaxStealPerSec))

  /** VALIDITY GATE (round 13): the r12 driver capture ran with a
    * sibling JVM alive at start and showed 5-8× inflation on three
    * keys the round never touched — the artifact carried the evidence
    * (`siblings_start`) but nothing refused to grade it. A capture
    * taken next to a live sibling JVM or under host steal above
    * [[MaxStealPerSec]] now stamps itself `invalid` with the reason,
    * so it can never be mistaken for a code regression. */
  private[graft] def invalidReason(sibsStart: Int, stealDelta: Long,
                                   elapsedSec: Double): Option[String] =
    if (sibsStart > 0)
      Some(s"$sibsStart sibling JVM(s) alive at start: timings contended")
    else if (stealDelta > 0 && elapsedSec > 0 &&
             stealDelta / elapsedSec > MaxStealPerSec)
      Some(String.format(java.util.Locale.ROOT,
        "host steal %.1f jiffies/s over the run > %.1f: timings stolen",
        Double.box(stealDelta / elapsedSec), Double.box(MaxStealPerSec)))
    else None

  /** WAIT-FOR-QUIET (round 14, verdict item): before stamping and
    * timing, spin — bounded by SPARK_GRAFT_BENCH_QUIET_WAIT_MS (0
    * disables) — until non-ancestor sibling JVMs have exited and the
    * idle steal rate settles under ~1 jiffy/s (the healthy PRE-RUN
    * reading on this box; the in-run gate [[MaxStealPerSec]] is wider
    * because steal tracks the bench's own load). Driver-run captures
    * that previously landed next to a finishing test JVM stamped
    * themselves invalid and lost the round's perf signal; now they
    * self-heal into valid artifacts when the box clears within the
    * window, and stamp invalid with evidence as before when it doesn't. */
  private def waitForQuiet(maxWaitMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    var quiet = false
    while (!quiet && System.currentTimeMillis() < deadline) {
      val (sibs, sibsBusy) = siblingJvms()
      val s0 = stealJiffies()
      Thread.sleep(2000)
      val rate = if (s0 < 0) 0.0 else (stealJiffies() - s0) / 2.0
      // gate on BUSY siblings: a permanently idle detached daemon (an
      // sbt/LSP server) would otherwise burn the whole wait window on
      // every capture and the run would proceed identically anyway
      if (sibsBusy <= 0 && rate <= 1.0) quiet = true
      else {
        System.err.println(String.format(java.util.Locale.ROOT,
          "[bench] waiting for quiet: siblings=%d (busy %d), idle steal %.1f jiffies/s",
          Int.box(sibs), Int.box(sibsBusy), Double.box(rate)))
        Thread.sleep(3000)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    waitForQuiet(sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT_MS",
      "120000").toLong)
    val wall0 = System.nanoTime()
    val loadStart = loadAvg()
    val stealStart = stealJiffies()
    // Sampled at BOTH ends: a sibling that contended mid-run but exited
    // before the end stamp would otherwise read as siblings=0.
    val (sibsStart, sibsStartBusy) = siblingJvms()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm up the JVM/codegen/parquet-reader paths once so per-query
    // timings measure the queries, not first-touch initialization.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }

    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => only.forall(_.contains(k)))
    var failed = List.empty[String]
    // Per-key validity: the steal-jiffies delta of the KEPT run — the
    // iteration whose time is reported (round 15; through round 14 the
    // stamp spanned all iterations, so one hot iteration tainted a
    // key whose reported minimum came from a quiet one). Four rounds
    // of driver captures ran hot with only whole-run stamps — per-key
    // deltas let a reader judge exactly the numbers in the artifact.
    val timed = keys.flatMap { name =>
      val fn = SparkEntry.queries(name)
      // MEASUREMENT HONESTY (round 11): `count()` lets Catalyst DELETE
      // whole branches — e.g. a left outer join to a unique-keyed
      // aggregate with no surviving right columns is eliminated
      // wholesale (the incremental-dedup and left/asof join tails), so
      // a count-based timing can measure a plan that never runs the
      // graded operator (dedup_incremental_minhash read 0.6 s at sf100
      // while the real plan takes ~20 s). Probe once, untimed: if
      // count() drops a leaf scan vs the key's own optimized plan,
      // time full materialization of the key's OWN plan (toRdd.count)
      // instead; unaffected keys keep count() for historical
      // comparability. Streaming keys do their work eagerly in
      // build(), so the probe would re-run the whole replay to decide
      // something that cannot hollow their timing — they keep count().
      // graft.tools.CountPlanProbe is the standalone sweep.
      //
      // EAGER-BUILDER KEYS skip the probe (their materialize verdict is
      // pinned below): the probe invokes fn() once untimed, and a
      // builder that does real work at DataFrame-construction time
      // (k-means fit + clustering for the semantic keys, index
      // ensure/collect for the *_indexed keys) would run its whole
      // pipeline an extra time AND pre-warm the memoized fit so no
      // timed iteration could ever be cold. Pinned verdicts come from
      // the CountPlanProbe sweep (the incremental keys' left-join
      // tails ARE count()-eliminated; dedup_semantic_blocked's plan is
      // not). Probe failures on other keys are LOGGED, not swallowed —
      // a silent false would quietly revert a flagged key to hollow
      // count() timing.
      val materialize = pinnedMaterialize.getOrElse(name,
        !name.startsWith("stream_") && (try {
          countEliminationProbe(fn(spark, sfDir))
        } catch {
          case t: Throwable =>
            System.err.println(
              s"[bench] count-elimination probe failed for $name " +
                s"(falling back to count() timing): ${t.getClass.getName}: ${t.getMessage}")
            false
        }))
      // Per-RUN steal deltas (round 15): each iteration carries its own
      // steal reading, and the key's reported steal stamp is the delta
      // of the RUN THAT PRODUCED the reported (minimum) time — the
      // number a reader actually needs to judge that number. When the
      // fastest run is still steal-tainted, up to
      // SPARK_GRAFT_BENCH_STEAL_RETRIES extra runs (default 2) are
      // taken, stopping at the first quiet one — the driver's capture
      // self-heals through transient steal bursts instead of stamping
      // the whole artifact invalid (see the healed-validity stamp in
      // main). Steal inflates wall-clock, so extra quiet runs can only
      // LOWER the reported minimum, never flatter it.
      def oneRun(): (Option[Double], Long) = {
        val r0 = stealJiffies()
        val t0 = System.nanoTime()
        val res =
          try {
            val df = fn(spark, sfDir)
            if (materialize) df.queryExecution.toRdd.count() else df.count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        (res, if (r0 < 0) -1L else math.max(-1L, stealJiffies() - r0))
      }
      var runs = (1 to iters).map(_ => oneRun()).toVector
      def kept: Option[(Double, Long)] =
        runs.collect { case (Some(t), sd) => (t, sd) }.sortBy(_._1).headOption
      val extraN = sys.env.getOrElse("SPARK_GRAFT_BENCH_STEAL_RETRIES", "2").toInt
      var extras = 0
      while (extras < extraN && kept.exists { case (t, sd) => !quietRun(sd, t) }) {
        extras += 1
        runs :+= oneRun()
      }
      val ld = loadAvg()
      kept match {
        case None => failed ::= name; None
        case Some((t, sd)) => Some((name, t, sd, ld))
      }
    }
    val total = timed.map(_._2).sum
    // Validity stamp: a loaded box or sibling JVMs invalidate wall-clock
    // timings; carrying the evidence in-artifact lets any reader judge.
    val loadEnd = loadAvg()
    val (sibs, sibsBusy) = siblingJvms()
    // Locale-pinned: a comma-decimal default locale would emit invalid JSON.
    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val stealDelta =
      if (stealStart < 0) -1L else math.max(-1L, stealJiffies() - stealStart)
    val elapsedSec = (System.nanoTime() - wall0) / 1e9
    // The gate verdict rides IN the artifact: a contaminated capture
    // still writes its numbers (a reader may salvage quiet keys via the
    // per-key steal map) but can never silently grade as a regression.
    val rawInvalid = invalidReason(sibsStart, stealDelta, elapsedSec)
    // HEALED VALIDITY (round 15, verdict item 8): two rounds of driver
    // captures stamped themselves invalid on sustained whole-run steal
    // even though the numbers a reader would take from them were fine.
    // With per-run steal stamps and the steal-retry loop above, the
    // whole-run gate can be refined: if EVERY reported key's kept run
    // was quiet, the artifact's numbers are quiet-window measurements
    // regardless of what the box did between them — stamp valid, carry
    // the raw reason as evidence. Sibling-JVM contamination is never
    // healed (contention leaves no counter trail to refute).
    val perKeyQuiet = timed.nonEmpty &&
      timed.forall { case (_, t, sd, _) => quietRun(sd, t) }
    val healed = rawInvalid.exists(_.contains("host steal")) && perKeyQuiet
    val invalid = if (healed) None else rawInvalid
    val validity =
      s""""load":${jnum(loadStart)},"load_end":${jnum(loadEnd)},"siblings_start":$sibsStart,"siblings_start_busy":$sibsStartBusy,"siblings":$sibs,"siblings_busy":$sibsBusy,"steal_jiffies":$stealDelta,"elapsed_sec":${jnum(elapsedSec)},"invalid":${invalid.nonEmpty},"invalid_reason":${invalid.map(r => "\"" + r + "\"").getOrElse("null")},"steal_healed":$healed${rawInvalid.filter(_ => healed).map(r => s""","healed_from":"$r"""").getOrElse("")}"""
    invalid.foreach(r => System.err.println(s"[bench] INVALID capture: $r"))
    val detailJson = timed.map { case (k, v, _, _) => s"\"$k\":${jnum(v)}" }
      .mkString("{", ",", "}")
    // Parallel validity maps (the documented "queries" map stays plain
    // numbers — the driver's parser depends on that shape).
    val stealJson = timed.map { case (k, _, sd, _) => s"\"$k\":$sd" }
      .mkString("{", ",", "}")
    val loadJson = timed.map { case (k, _, _, l) => s"\"$k\":${jnum(l)}" }
      .mkString("{", ",", "}")
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Output prefix is overridable so dedicated runs (scale sweeps,
    // per-key probes) can never clobber the committed reference
    // snapshot at bench_details.json/bench_summary.json.
    val outPrefix = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREFIX", "bench")
    val full =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","n":$iters,"cpus":$cpus,"sf":"$sfDir",$validity,"failed":$failedJson,"queries":$detailJson,"queries_steal":$stealJson,"queries_load":$loadJson}"""
    Files.writeString(Paths.get(s"${outPrefix}_details.json"), full)
    val hq = timed.filter(t => headline.contains(t._1))
      .map { case (k, v, _, _) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    // Headliners only in the summary (full per-key map is in details):
    // the summary line must stay well under the driver's capture limit.
    val hqSteal = timed.filter(t => headline.contains(t._1))
      .map { case (k, _, sd, _) => s"\"$k\":$sd" }.mkString("{", ",", "}")
    spark.stop()
    // Short parse-safe summary: printed as the very last stdout line AND
    // written to bench_summary.json, so the driver has a machine-readable
    // total even when an sbt wrapper frames stdout with [info]/[success].
    val short =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","n":$iters,"n_queries":${timed.size},$validity,"failed":$failedJson,"queries":$hq,"queries_steal":$hqSteal,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(s"${outPrefix}_summary.json"), short)
    println(short)
  }
}
