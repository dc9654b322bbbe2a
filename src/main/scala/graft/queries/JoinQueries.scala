package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}
import graft.ops.AsOfJoin

/** §2.3 joins. Spark-first choices for 100 TB scale:
  * - equi-joins are declared and Catalyst/AQE pick broadcast-hash vs
  *   sort-merge (small dims like nation/region always broadcast);
  * - `join_broadcast` pins the hint explicitly for the dim-table case;
  * - as-of is the union+window construction (see [[graft.ops.AsOfJoin]]),
  *   one key-shuffle instead of a nested loop;
  * - the range/banding join keeps the band table literal (broadcast
  *   nested loop over a ~5-row side: trivially scale-safe).
  */
object JoinQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    GQuery("join_inner",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer").as("c")
          .join(Tables(s, dir, "orders").as("o"), $"c_custkey" === $"o_custkey")
          .filter($"c_custkey" < 100)
          .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
          .orderBy($"c_custkey", $"o_orderkey")
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
              FROM customer JOIN orders ON c_custkey = o_custkey
              WHERE c_custkey < 100
              ORDER BY c_custkey, o_orderkey""")),

    GQuery("join_left",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_orders"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    GQuery("join_right",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey", "right")
          .groupBy($"o_orderkey")
          .agg(count($"l_orderkey").as("n_items"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, COUNT(l_orderkey) AS n_items
              FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderkey ORDER BY o_orderkey""")),

    GQuery("join_outer",
      (s, dir) => {
        import s.implicits._
        val users = Tables(s, dir, "events").select($"user_id").distinct()
        Tables(s, dir, "customer").select($"c_custkey")
          .join(users, $"c_custkey" === $"user_id", "full_outer")
          .select($"c_custkey", $"user_id")
          .orderBy(coalesce($"c_custkey", $"user_id").asc_nulls_last,
                   $"c_custkey".asc_nulls_last)
      },
      Some("""SELECT c_custkey, user_id
              FROM customer FULL OUTER JOIN (SELECT DISTINCT user_id FROM events) e
                ON c_custkey = user_id
              ORDER BY COALESCE(c_custkey, user_id) ASC NULLS LAST,
                       c_custkey ASC NULLS LAST""")),

    GQuery("join_semi",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    GQuery("join_anti",
      (s, dir) => {
        import s.implicits._
        val urgent = Tables(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
        Tables(s, dir, "customer")
          .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderpriority = '1-URGENT')
              ORDER BY c_custkey""")),

    GQuery("join_broadcast",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .join(broadcast(Tables(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_customers"),
               Det.dsum($"c_acctbal").as("sum_acctbal"))
          .orderBy($"n_name")
      },
      Some(s"""SELECT n_name, COUNT(*) AS n_customers,
              ${Det.sql.dsum("c_acctbal")} AS sum_acctbal
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    GQuery("join_cross",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "region").crossJoin(Tables(s, dir, "nation"))
          .select($"r_name", $"n_name")
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
              ORDER BY r_name, n_name""")),

    // For each purchase event: most recent click by the same user at/before it.
    GQuery("join_asof",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        AsOfJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
            rightCols = Seq("click_id"))
          .select($"event_id", $"user_id", $"click_id")
          .orderBy($"event_id")
      },
      // Not ASOF JOIN: ties at equal (user_id, ts) are unspecified there;
      // this correlated lookup pins the same max-(ts, click_id) choice
      // the Spark window makes.
      Some("""SELECT p.event_id, p.user_id,
                (SELECT c.event_id FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.event_id""")),

    // Forward direction (dask merge_asof direction="forward"): the next
    // click at/after each purchase; ties pinned to min (ts, click_id).
    GQuery("join_asof_forward",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        AsOfJoin.forward(purchases, clicks, key = "user_id", ts = "ts",
            rightCols = Seq("click_id"))
          .select($"event_id", $"user_id", $"click_id")
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
                (SELECT c.event_id FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts >= p.ts
                 ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS click_id
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.event_id""")),

    // dask merge_asof(tolerance=...): the backward match is kept only
    // when it is at most 24h old, else NULL. Same single-shuffle
    // union+window plan — the matched right ts rides the carry and the
    // tolerance is a post-window column predicate (no extra join).
    GQuery("join_asof_tolerance",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        AsOfJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
            rightCols = Seq("click_id"),
            toleranceUs = Some(24L * 3600 * 1000000))
          .select($"event_id", $"user_id", $"click_id")
          .orderBy($"event_id")
      },
      // Tolerance inside the lookup is equivalent: if the LATEST prior
      // click is out of tolerance, every earlier one is too.
      Some("""SELECT p.event_id, p.user_id,
                (SELECT c.event_id FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.event_id""")),

    // dask merge_asof(allow_exact_matches=False): strictly-before match
    // (right.ts < left.ts). Implemented purely in the window tie-break
    // (left probes sort before same-ts right rows), zero extra cost.
    GQuery("join_asof_strict",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        AsOfJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
            rightCols = Seq("click_id"), allowExactMatches = false)
          .select($"event_id", $"user_id", $"click_id")
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
                (SELECT c.event_id FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts < p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.event_id""")),

    // Nearest direction (dask merge_asof direction="nearest"): closer
    // of the backward/forward matches by |Δts|, ties to backward —
    // composed from the two directional passes joined on the probe id.
    GQuery("join_asof_nearest",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"),
            $"ts".as("click_ts"))
        val bwd = AsOfJoin.backward(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_ts"))
          .select($"event_id", $"user_id", $"ts",
            $"click_id".as("b_id"), unix_micros($"click_ts").as("b_us"))
        val fwd = AsOfJoin.forward(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_ts"))
          .select($"event_id".as("f_event_id"),
            $"click_id".as("f_id"), unix_micros($"click_ts").as("f_us"))
        bwd.join(fwd, $"event_id" === $"f_event_id")
          .withColumn("l_us", unix_micros($"ts"))
          .select($"event_id", $"user_id",
            when($"b_us".isNull, $"f_id")
              .when($"f_us".isNull, $"b_id")
              .when($"l_us" - $"b_us" <= $"f_us" - $"l_us", $"b_id")
              .otherwise($"f_id").as("click_id"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
                CASE WHEN b_us IS NULL THEN f_id
                     WHEN f_us IS NULL THEN b_id
                     WHEN l_us - b_us <= f_us - l_us THEN b_id
                     ELSE f_id END AS click_id
              FROM (
                SELECT p.event_id, p.user_id, epoch_us(p.ts) AS l_us,
                  (SELECT epoch_us(c.ts) FROM events c
                   WHERE c.event_type = 'click' AND c.user_id = p.user_id
                     AND c.ts <= p.ts
                   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b_us,
                  (SELECT c.event_id FROM events c
                   WHERE c.event_type = 'click' AND c.user_id = p.user_id
                     AND c.ts <= p.ts
                   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b_id,
                  (SELECT epoch_us(c.ts) FROM events c
                   WHERE c.event_type = 'click' AND c.user_id = p.user_id
                     AND c.ts >= p.ts
                   ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS f_us,
                  (SELECT c.event_id FROM events c
                   WHERE c.event_type = 'click' AND c.user_id = p.user_id
                     AND c.ts >= p.ts
                   ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS f_id
                FROM events p WHERE p.event_type = 'purchase') t
              ORDER BY event_id""")),

    // Same as-of semantics through the NATIVE physical operator
    // (graft.plans.AsOfJoinNative: custom LogicalPlan + Strategy +
    // merge-join SparkPlan — one hash-clustered shuffle per side, one
    // forward merge, constant memory; no union padding, no window
    // state). Same oracle as join_asof.
    GQuery("join_asof_native",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        graft.plans.AsOfJoinNative.backward(purchases, clicks,
            key = "user_id", ts = "ts", rightCols = Seq("click_id"))
          .select($"event_id", $"user_id", $"click_id")
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
                (SELECT c.event_id FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.event_id""")),

    // TPC-H Q3 shape: 3-way join → group → top-10 (SURVEY.md §7 M1).
    // Catalyst broadcast-hashes customer (small side) and sort-merges
    // orders⋈lineitem; TakeOrderedAndProject caps the sort at k=10.
    GQuery("q3_shipping_priority",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
          .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .join(Tables(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp") &&
                  $"l_shipdate" > lit("1998-01-01").cast("timestamp"))
          .groupBy($"l_orderkey", $"o_orderpriority")
          .agg(Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderpriority,
              ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY l_orderkey, o_orderpriority
              ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // Skew-safe salted join (deterministic salt → same result as the
    // plain join, oracle included; the mechanism for keys hotter than
    // AQE's skew-split thresholds).
    GQuery("join_skew_salted",
      (s, dir) => {
        import s.implicits._
        val joined = graft.ops.SkewJoin.saltedInner(
          Tables(s, dir, "events"), Tables(s, dir, "customer"),
          "user_id", "c_custkey", col("event_id"), salts = 8)
        joined.groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), Det.dsum($"value").as("sum_value"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n, ${Det.sql.dsum("value")} AS sum_value
              FROM events JOIN customer ON user_id = c_custkey
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Co-located join via bucketing: both tables bucketed+sorted on the
    // join key, so the join needs NO shuffle of either side (the
    // bucketed scan already provides the required hash partitioning).
    // At 100 TB this is the difference between an exabyte of network
    // and none — the write-side cost is paid once, every join reuses it.
    // The bucketed copies are created ONCE per (session, sfDir) by
    // graft.engine.Scratch — pay-once-read-forever, so graded/benched
    // executions time the shuffle-free join, not the table write.
    GQuery("join_bucketed",
      (s, dir) => {
        import s.implicits._
        val ot = graft.engine.Scratch.bucketedTable(s, dir, "orders", "o_orderkey")
        val lt = graft.engine.Scratch.bucketedTable(s, dir, "lineitem", "l_orderkey")
        s.table(ot)
          .join(s.table(lt), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
               Det.dsum($"l_quantity").as("sum_qty"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_items,
              ${Det.sql.dsum("l_quantity")} AS sum_qty
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // MERGE INTO (SCD-1 upsert): a CDC-style source batch — balance
    // updates for matched keys, brand-new rows for unmatched — lands on
    // the customer table. ops.MergeInto plans ONE left-anti shuffle of
    // the target against the distinct source keys plus a union; never a
    // full-outer join (whose per-column coalesce reshuffles both sides
    // and kills column pruning). With the target bucketed on the key
    // the anti join is shuffle-free on the big side — the lakehouse
    // MERGE layout. Streaming-side idempotent upsert is covered by
    // ForeachBatchUpsertSpec; this is its batch surface.
    GQuery("merge_upsert",
      (s, dir) => {
        import s.implicits._
        val target = Tables(s, dir, "customer")
        val updates = target.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", $"c_acctbal" + 100.0)
        val inserts = target.filter($"c_custkey" % 97 === 0)
          .withColumn("c_custkey", $"c_custkey" + 5000000000L)
        graft.ops.MergeInto
          .upsert(target, updates.unionByName(inserts), Seq("c_custkey"))
          .orderBy($"c_custkey")
      },
      Some("""WITH src AS (
                SELECT c_custkey, c_name, c_nationkey,
                       c_acctbal + 100.0 AS c_acctbal, c_mktsegment
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey + 5000000000, c_name, c_nationkey,
                       c_acctbal, c_mktsegment
                FROM customer WHERE c_custkey % 97 = 0)
              SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
              FROM (
                SELECT * FROM customer t WHERE NOT EXISTS
                  (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey)
                UNION ALL
                SELECT * FROM src)
              ORDER BY c_custkey""")),

    // SCHEMA EVOLUTION ON MERGE (round 15): the CDC batch ADDS a column
    // the published table never had (a re-labeling pass stamping a
    // review flag — the commonest evolution in a training-data
    // pipeline). Behind spark.graft.merge.allowSchemaEvolution the
    // merge-on-read commit accepts it; the reconciled read unions BY
    // NAME with null backfill, so every pre-evolution row reads back
    // NULL in the new column and every merged row carries its value.
    // Dropped columns stay a loud refusal (MaintenanceSpec) — silently
    // losing a column under merge semantics corrupts every non-matched
    // row. The oracle reconstructs the whole evolved table in SQL, so
    // the backfill semantics are hash-graded end to end.
    GQuery("merge_upsert_evolved",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("evolve_customer")
        val target = Tables(s, dir, "customer")
        graft.ops.AtomicPublish.publish(s, table)(p => target.write.parquet(p))
        val src = target.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", $"c_acctbal" + 100.0)
          .withColumn("review_flag", lit(1L))
        s.conf.set(graft.ops.MergeInto.AllowEvolutionKey, "true")
        try graft.ops.MergeInto.upsertInto(s, table, src, Seq("c_custkey"))
        finally s.conf.unset(graft.ops.MergeInto.AllowEvolutionKey)
        graft.ops.AtomicPublish.read(s, table).orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                CASE WHEN c_custkey % 10 = 3
                     THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
                c_mktsegment,
                CASE WHEN c_custkey % 10 = 3
                     THEN CAST(1 AS BIGINT) ELSE NULL END AS review_flag
              FROM customer ORDER BY c_custkey""")),

    // ROW-LEVEL DELETE (round 15): merge-on-read tombstones — GDPR
    // erasure, toxic-document retraction, label recalls — the write
    // costs ∝ THE DELETED-KEY SET (one tiny parquet file + manifest
    // CAS; the Iceberg equality-delete shape), never the corpus. The
    // key exercises the full ordinal clock: publish → DELETE WHERE
    // (predicate → observed keys → tombstone) → a LATER upsert
    // re-inserting half the deleted keys (tombstones must not eat
    // subsequent re-inserts). The oracle reconstructs the surviving
    // set + re-inserted values in SQL, so tombstone claim semantics
    // are hash-graded end to end.
    GQuery("merge_delete",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("del_customer")
        val target = Tables(s, dir, "customer")
        graft.ops.AtomicPublish.publish(s, table)(p => target.write.parquet(p))
        graft.ops.MergeInto.deleteWhere(s, table,
          $"c_custkey" % 7 === 0, Seq("c_custkey"))
        val reinserts = target.filter($"c_custkey" % 14 === 0)
          .withColumn("c_acctbal", $"c_acctbal" + 500.0)
        graft.ops.MergeInto.upsertInto(s, table, reinserts, Seq("c_custkey"))
        graft.ops.AtomicPublish.read(s, table).orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                CASE WHEN c_custkey % 14 = 0
                     THEN c_acctbal + 500.0 ELSE c_acctbal END AS c_acctbal,
                c_mktsegment
              FROM customer
              WHERE c_custkey % 7 <> 0 OR c_custkey % 14 = 0
              ORDER BY c_custkey""")),

    // Row-level UPDATE (round 16): `UPDATE t SET … WHERE …` riding the
    // merge-on-read upsert path — the matched rows land as ONE upsert
    // segment (write ∝ matched rows, never the corpus), reconciliation
    // chains the second update over the first's postimage, and a
    // zero-match update commits NOTHING (no empty segment). SET
    // touching a merge key or naming an unknown column is refused
    // loudly (spec-pinned in MergeSpec).
    GQuery("merge_update",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("upd_customer")
        val target = Tables(s, dir, "customer")
        graft.ops.AtomicPublish.publish(s, table)(p => target.write.parquet(p))
        graft.ops.MergeInto.updateWhere(s, table,
          $"c_custkey" % 5 === 0,
          Map("c_acctbal" -> ($"c_acctbal" + 100.0),
              "c_mktsegment" -> lit("UPDATED")),
          Seq("c_custkey"))
        // chained update: reads the FIRST update's postimage through
        // merge-on-read reconciliation before landing its own segment
        graft.ops.MergeInto.updateWhere(s, table,
          $"c_custkey" % 10 === 0,
          Map("c_acctbal" -> ($"c_acctbal" + 9000.0)),
          Seq("c_custkey"))
        val vBefore = graft.ops.AtomicPublish.currentVersion(s, table).get
        // zero matches: no commit — version must not advance
        graft.ops.MergeInto.updateWhere(s, table,
          $"c_custkey" < 0, Map("c_acctbal" -> lit(0.0)), Seq("c_custkey"))
        require(graft.ops.AtomicPublish.currentVersion(s, table)
          .contains(vBefore),
          "merge_update: a zero-match UPDATE committed a version")
        graft.ops.AtomicPublish.read(s, table).orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 + 9000.0
                     WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                     ELSE c_acctbal END AS c_acctbal,
                CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED'
                     ELSE c_mktsegment END AS c_mktsegment
              FROM customer
              ORDER BY c_custkey""")),

    // FULL-SYNC MERGE (round 16): `WHEN NOT MATCHED BY SOURCE THEN
    // DELETE` — the table is made to mirror the source in ONE commit
    // (upsert batch + stale-key tombstones land under a single
    // manifest swap; the in-key require pins the version delta to 1,
    // so a lagging reader can never observe the half-applied middle).
    // The sync rides over a PENDING merge segment, proving the
    // stale-key scan reads the reconciled view, not the base.
    GQuery("merge_sync",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("sync_customer")
        val cust = Tables(s, dir, "customer")
        graft.ops.AtomicPublish.publish(s, table)(p => cust.write.parquet(p))
        // pending merge-on-read segment under the sync
        graft.ops.MergeInto.upsertInto(s, table,
          cust.filter($"c_custkey" % 5 === 1)
            .withColumn("c_acctbal", $"c_acctbal" + 10.0),
          Seq("c_custkey"))
        val vBefore = graft.ops.AtomicPublish.currentVersion(s, table).get
        val source = cust.filter($"c_custkey" % 3 === 0)
          .withColumn("c_acctbal", $"c_acctbal" + 50.0)
          .unionByName(cust.filter($"c_custkey" % 9 === 1)
            .withColumn("c_custkey", $"c_custkey" + 1000000L)
            .withColumn("c_mktsegment", lit("FRESH")))
        graft.ops.MergeInto.syncInto(s, table, source, Seq("c_custkey"))
        require(graft.ops.AtomicPublish.currentVersion(s, table)
          .contains(vBefore + 1),
          "merge_sync: the sync must land as exactly ONE commit")
        graft.ops.AtomicPublish.read(s, table).orderBy($"c_custkey")
      },
      Some("""SELECT * FROM (
                SELECT c_custkey, c_name, c_nationkey,
                       c_acctbal + 50.0 AS c_acctbal, c_mktsegment
                FROM customer WHERE c_custkey % 3 = 0
                UNION ALL
                SELECT c_custkey + 1000000, c_name, c_nationkey,
                       c_acctbal, 'FRESH'
                FROM customer WHERE c_custkey % 9 = 1) t
              ORDER BY c_custkey""")),

    // PARTIAL OVERWRITE (round 16): Delta's `INSERT OVERWRITE …
    // replaceWhere` — one commit deletes the predicate's rows and
    // inserts the recomputed batch. The table is range-clustered
    // first, so the in-key require proves the zone-pruned partial
    // rewrite KEPT disjoint segments in place (the daily-partition
    // reload that rewrites the affected range, not the corpus).
    GQuery("merge_replace_where",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("rw_orders")
        val orders = Tables(s, dir, "orders")
        graft.ops.AtomicPublish.publish(s, table)(p =>
          orders.write.parquet(p))
        graft.ops.AtomicPublish.optimizeTable(s, table,
          Seq("o_orderkey"), segments = 4)
        val before = graft.ops.AtomicPublish.currentSegments(s, table)
        val batch = orders.filter($"o_orderkey".between(100L, 500L))
          .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
          .withColumn("o_orderpriority", lit("5-REPLACED"))
        graft.ops.MergeInto.replaceWhere(s, table,
          $"o_orderkey".between(100L, 500L), batch)
        val after = graft.ops.AtomicPublish.currentSegments(s, table)
        require(before.toSet.intersect(after.toSet).nonEmpty,
          "merge_replace_where: zone pruning kept no segment in place — " +
            "the partial rewrite went full-corpus on a clustered table")
        graft.ops.AtomicPublish.read(s, table).orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey BETWEEN 100 AND 500
                     THEN o_totalprice + 1000.0
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate,
                CASE WHEN o_orderkey BETWEEN 100 AND 500
                     THEN '5-REPLACED'
                     ELSE o_orderpriority END AS o_orderpriority
              FROM orders
              ORDER BY o_orderkey""")),

    // SQL DML, KEYLESS (round 16): `DELETE FROM … WHERE` and
    // `UPDATE … SET … WHERE` in plain SQL text over a catalog table
    // with NO merge identity — the GraftDmlRule routes both through
    // zone-pruned COPY-ON-WRITE partial rewrites
    // (MergeInto.deleteMatching/updateMatching): only segments whose
    // zonemaps admit the predicate are rewritten, disjoint segments
    // and the clustering layout stay in place, and NO merge sidecar
    // ever appears (the in-key require). At 100 TB a one-day purge on
    // a date-clustered table rewrites the affected range, never the
    // corpus. The oracle reconstructs the delete+update composition.
    GQuery("sql_delete_update",
      (s, dir) => {
        val wh = graft.engine.Scratch.dir("sqldml_wh")
        s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_dml.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_dml.dml")
        val tp = new org.apache.hadoop.fs.Path(s"$wh/dml/cust_cow")
        val fs = tp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(tp)) fs.delete(tp, true)
        Tables(s, dir, "customer").createOrReplaceTempView("cust_src_cow")
        s.sql("CREATE TABLE graft_dml.dml.cust_cow AS SELECT * FROM cust_src_cow")
        s.sql("DELETE FROM graft_dml.dml.cust_cow WHERE c_custkey % 10 = 3")
        s.sql("""UPDATE graft_dml.dml.cust_cow
                 SET c_acctbal = c_acctbal + 100.0
                 WHERE c_mktsegment = 'BUILDING'""")
        val t = s"$wh/dml/cust_cow"
        val segs = graft.ops.AtomicPublish.currentSegments(s, t)
        require(graft.ops.AtomicPublish.upsertSidecarsFor(s, t, segs).isEmpty,
          "sql_delete_update: keyless DML must stay copy-on-write — a " +
            "merge sidecar appeared")
        s.sql("SELECT * FROM graft_dml.dml.cust_cow ORDER BY c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                CASE WHEN c_mktsegment = 'BUILDING'
                     THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
                c_mktsegment
              FROM customer WHERE c_custkey % 10 <> 3
              ORDER BY c_custkey""")),

    // SQL MERGE INTO, KEYED (round 16): the table declares its merge
    // identity at CREATE (`TBLPROPERTIES('merge.keys'='c_custkey')`),
    // so `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    // THEN INSERT *` lands as ONE merge-on-read upsert segment — write
    // ∝ the batch, the CDC-ingest shape at 100 TB — and the final
    // SELECT reads the table BY NAME while the merge is still PENDING:
    // the DML rule expands the placeholder relation into the
    // reconciled claims-join plan (the in-key require pins that the
    // pending segment really is there, i.e. the read exercised
    // reconciliation, not a fold). Oracle: updates +100 the matched
    // residues, the batch re-inserts the residue-3 rows the base
    // never had.
    GQuery("sql_merge_upsert",
      (s, dir) => {
        val wh = graft.engine.Scratch.dir("sqldml_wh")
        s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_dml.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_dml.dml")
        val tp = new org.apache.hadoop.fs.Path(s"$wh/dml/cust_mrg")
        val fs = tp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(tp)) fs.delete(tp, true)
        Tables(s, dir, "customer").createOrReplaceTempView("cust_src_mrg")
        s.sql("""CREATE TABLE graft_dml.dml.cust_mrg
                 TBLPROPERTIES ('merge.keys'='c_custkey') AS
                 SELECT * FROM cust_src_mrg WHERE c_custkey % 10 <> 3""")
        s.sql("""MERGE INTO graft_dml.dml.cust_mrg t
                 USING (SELECT c_custkey, c_name, c_nationkey,
                               c_acctbal + 100.0 AS c_acctbal, c_mktsegment
                        FROM cust_src_mrg
                        WHERE c_custkey % 10 IN (2, 3)) s
                 ON t.c_custkey = s.c_custkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
        val t = s"$wh/dml/cust_mrg"
        val segs = graft.ops.AtomicPublish.currentSegments(s, t)
        require(graft.ops.AtomicPublish.upsertSidecarsFor(s, t, segs).nonEmpty,
          "sql_merge_upsert: the MERGE must land merge-on-read (pending " +
            "upsert segment) — found none")
        s.sql("SELECT * FROM graft_dml.dml.cust_mrg ORDER BY c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                CASE WHEN c_custkey % 10 IN (2, 3)
                     THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
                c_mktsegment
              FROM customer
              ORDER BY c_custkey""")),

    // SQL FULL-SYNC MERGE (round 16): `WHEN NOT MATCHED BY SOURCE THEN
    // DELETE` in SQL text — the replica-maintenance statement. The
    // rule routes it to MergeInto.syncInto: upsert batch + stale-key
    // tombstones under ONE manifest swap (the version-delta require),
    // then the by-name read reconciles the mirrored state. Oracle: the
    // table must BE the source — residue-0 customers with +50.0.
    GQuery("sql_merge_sync",
      (s, dir) => {
        val wh = graft.engine.Scratch.dir("sqldml_wh")
        s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_dml.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_dml.dml")
        val tp = new org.apache.hadoop.fs.Path(s"$wh/dml/cust_sync")
        val fs = tp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(tp)) fs.delete(tp, true)
        Tables(s, dir, "customer").createOrReplaceTempView("cust_src_sync")
        s.sql("""CREATE TABLE graft_dml.dml.cust_sync
                 TBLPROPERTIES ('merge.keys'='c_custkey') AS
                 SELECT * FROM cust_src_sync""")
        val t = s"$wh/dml/cust_sync"
        val vBefore = graft.ops.AtomicPublish.currentVersion(s, t).get
        s.sql("""MERGE INTO graft_dml.dml.cust_sync t
                 USING (SELECT c_custkey, c_name, c_nationkey,
                               c_acctbal + 50.0 AS c_acctbal, c_mktsegment
                        FROM cust_src_sync WHERE c_custkey % 3 = 0) s
                 ON t.c_custkey = s.c_custkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
        require(graft.ops.AtomicPublish.currentVersion(s, t)
          .contains(vBefore + 1),
          "sql_merge_sync: the sync must land as exactly ONE commit")
        s.sql("SELECT * FROM graft_dml.dml.cust_sync ORDER BY c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
                c_acctbal + 50.0 AS c_acctbal, c_mktsegment
              FROM customer WHERE c_custkey % 3 = 0
              ORDER BY c_custkey""")),

    // CDF AS A TABLE-VALUED FUNCTION (round 16): Delta's
    // `table_changes('t', from, to)` spelled exactly — registered via
    // injectTableFunction (graft.plans.GraftSqlParser.tableChangesPlan),
    // resolving the name through the catalog and returning the SAME
    // fold-surviving change-feed plan changesBetween builds for the
    // API. The WHOLE history here is driven by SQL: CTAS + INSERT +
    // MERGE + OPTIMIZE (a fold mid-window — zero change rows, the feed
    // diffs through it) + DELETE, then the TVF reads the window in
    // one SELECT. A regression in any of parser, DML rule, TVF
    // binding, or feed classification diverges the oracle.
    GQuery("sql_table_changes",
      (s, dir) => {
        val wh = graft.engine.Scratch.dir("sqlutil_wh")
        s.conf.set("spark.sql.catalog.graft_util", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_util.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_util.util")
        val t = s"$wh/util/cust_cdf"
        val tp = new org.apache.hadoop.fs.Path(t)
        val fs = tp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(tp)) fs.delete(tp, true)
        Tables(s, dir, "customer").createOrReplaceTempView("cust_src_cdf")
        s.sql("""CREATE TABLE graft_util.util.cust_cdf
                 TBLPROPERTIES ('merge.keys'='c_custkey') AS
                 SELECT * FROM cust_src_cdf WHERE c_custkey % 3 = 0""") // v1+v2
        s.sql("""INSERT INTO graft_util.util.cust_cdf
                 SELECT * FROM cust_src_cdf WHERE c_custkey % 3 = 1""") // v3
        s.sql("""MERGE INTO graft_util.util.cust_cdf t
                 USING (SELECT c_custkey, c_name, c_nationkey,
                          CASE WHEN c_custkey % 6 = 0
                               THEN c_acctbal + 100.0 ELSE c_acctbal END
                            AS c_acctbal,
                          c_mktsegment
                        FROM cust_src_cdf
                        WHERE c_custkey % 6 = 0
                           OR (c_custkey % 3 = 2 AND c_custkey % 2 = 0)) s
                 ON t.c_custkey = s.c_custkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")                      // v4
        s.sql("OPTIMIZE graft_util.util.cust_cdf")            // v5 (fold)
        s.sql("""DELETE FROM graft_util.util.cust_cdf
                 WHERE c_custkey % 9 = 0""")                             // v6
        require(graft.ops.AtomicPublish.currentVersion(s, t).contains(6L),
          "sql_table_changes: expected exactly six SQL-driven commits")
        s.sql("""SELECT c_custkey, c_name, c_acctbal,
                   _change_type AS change_type,
                   _commit_version - 2 AS commit_step
                 FROM table_changes('graft_util.util.cust_cdf', 2, 6)
                 ORDER BY commit_step, c_custkey, change_type""")
      },
      Some("""SELECT * FROM (
                SELECT c_custkey, c_name, c_acctbal,
                       'insert' AS change_type, CAST(1 AS BIGINT) AS commit_step
                FROM customer WHERE c_custkey % 3 = 1
                UNION ALL
                SELECT c_custkey, c_name, c_acctbal + 100.0,
                       'update_postimage', 2
                FROM customer WHERE c_custkey % 6 = 0
                UNION ALL
                SELECT c_custkey, c_name, c_acctbal, 'insert', 2
                FROM customer WHERE c_custkey % 3 = 2 AND c_custkey % 2 = 0
                UNION ALL
                SELECT c_custkey, CAST(NULL AS VARCHAR),
                       CAST(NULL AS DOUBLE), 'delete', 4
                FROM customer WHERE c_custkey % 9 = 0)
              ORDER BY commit_step, c_custkey, change_type""")),

    // CHANGE DATA FEED (round 15): the row-level changes between two
    // commits, derived from the version log + merge sidecars at READ
    // time (no per-write change files) — the Delta `table_changes`
    // consumer shape for feeding downstream tables without re-scanning
    // the corpus. Window: append (always `insert`, even for a key that
    // already exists — appends accumulate), upsert (`update_postimage`
    // when the key was live, `insert` when never seen), delete
    // (key-only `delete` records for live keys; dead keys emit
    // nothing). Round 16: a COMPACTION lands mid-window — fold commits
    // are declared content-preserving in the version log and the feed
    // diffs THROUGH them (the fold contributes zero change rows, the
    // commits around it keep their classifications) — so the headline
    // CDF key itself grades the lagging-consumer-survives-auto-fold
    // contract, not just its MV/streaming consumers. The oracle
    // reconstructs every classification in SQL over the same
    // deterministic slices; `commit_step` = commits since the window
    // start, so the key is version-base independent (the fold is
    // step 3, the delete step 4).
    GQuery("table_changes",
      (s, dir) => {
        import s.implicits._
        val table = graft.engine.Scratch.dir("cdf_customer")
        val cust = Tables(s, dir, "customer")
        graft.ops.AtomicPublish.publish(s, table)(p =>
          cust.filter($"c_custkey" % 3 === 0).write.parquet(p))
        val v1 = graft.ops.AtomicPublish.currentVersion(s, table)
          .getOrElse(sys.error("version log missing after publish"))
        graft.ops.AtomicPublish.appendSegment(s, table)(p =>
          cust.filter($"c_custkey" % 3 === 1).write.parquet(p))
        val ups = cust.filter($"c_custkey" % 6 === 0)
          .withColumn("c_acctbal", $"c_acctbal" + 100.0)
          .unionByName(cust.filter($"c_custkey" % 3 === 2 &&
            $"c_custkey" % 2 === 0))
        graft.ops.MergeInto.upsertInto(s, table, ups, Seq("c_custkey"))
        // fold mid-window: zero change rows, and the feed must diff
        // straight through it (round 15 refused here)
        graft.ops.MergeInto.compactMerged(s, table)
        graft.ops.MergeInto.deleteFrom(s, table,
          cust.filter($"c_custkey" % 9 === 0).select($"c_custkey"),
          Seq("c_custkey"))
        val vNow = graft.ops.AtomicPublish.currentVersion(s, table).get
        graft.ops.AtomicPublish.changesBetween(s, table, v1, vNow)
          .select($"c_custkey", $"c_name", $"c_acctbal",
            col("_change_type").as("change_type"),
            (col("_commit_version") - v1).as("commit_step"))
          .orderBy($"commit_step", $"c_custkey", $"change_type")
      },
      Some("""SELECT * FROM (
                SELECT c_custkey, c_name, c_acctbal,
                       'insert' AS change_type, CAST(1 AS BIGINT) AS commit_step
                FROM customer WHERE c_custkey % 3 = 1
                UNION ALL
                SELECT c_custkey, c_name, c_acctbal + 100.0,
                       'update_postimage', 2
                FROM customer WHERE c_custkey % 6 = 0
                UNION ALL
                SELECT c_custkey, c_name, c_acctbal, 'insert', 2
                FROM customer WHERE c_custkey % 3 = 2 AND c_custkey % 2 = 0
                UNION ALL
                SELECT c_custkey, CAST(NULL AS VARCHAR),
                       CAST(NULL AS DOUBLE), 'delete', 4
                FROM customer WHERE c_custkey % 9 = 0)
              ORDER BY commit_step, c_custkey, change_type""")),

    // Banding join: orders classified into literal price bands (range predicate).
    GQuery("join_range",
      (s, dir) => {
        import s.implicits._
        val bands = s.createDataFrame(Seq(
          ("S", 0.0, 100000.0),
          ("M", 100000.0, 250000.0),
          ("L", 250000.0, 400000.0),
          ("XL", 400000.0, 1000000.0))).toDF("band", "lo", "hi")
        Tables(s, dir, "orders")
          .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"band")
      },
      Some("""SELECT band, COUNT(*) AS n_orders
              FROM orders
              JOIN (VALUES ('S', 0.0, 100000.0), ('M', 100000.0, 250000.0),
                           ('L', 250000.0, 400000.0), ('XL', 400000.0, 1000000.0))
                   AS b(band, lo, hi)
                ON o_totalprice >= lo AND o_totalprice < hi
              GROUP BY band ORDER BY band""")),

    // TPC-H Q5-shaped flagship: 6-table local-supplier revenue. The
    // plan the optimizer should (and does) pick at any scale: the three
    // dimension sides (region→nation, supplier) broadcast, lineitem —
    // the only big table — streams through ONE shuffle to meet orders;
    // the date filter pushes to the orders scan and the region filter
    // prunes nation before anything joins it. Revenue uses the q1
    // Det pattern (exact 4-decimal sums) so the double hash-matches.
    GQuery("q5_local_supplier",
      (s, dir) => {
        import s.implicits._
        val asia = Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region")
            .filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
        val ord = Tables(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
            && $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        Tables(s, dir, "customer")
          .join(broadcast(asia), $"c_nationkey" === $"n_nationkey")
          .join(ord, $"c_custkey" === $"o_custkey")
          .join(Tables(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(Tables(s, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
          .groupBy($"n_name")
          .agg(Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
            .as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(s"""SELECT n_name,
              ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              FROM customer
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              WHERE r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY n_name
              ORDER BY revenue DESC, n_name""")),

    // TPC-H Q7-shaped flagship: bilateral shipping volume between two
    // nations by ship year. Plan at any scale: both nation sides
    // broadcast onto supplier/customer (which then broadcast onto the
    // big tables), lineitem⋈orders is the ONE big shuffle, the
    // bilateral-pair predicate prunes before it. `year()` is integer
    // calendar math — deterministic on both engines.
    GQuery("q7_volume_shipping",
      (s, dir) => {
        import s.implicits._
        val supN = Tables(s, dir, "supplier")
          .join(broadcast(Tables(s, dir, "nation")
            .filter($"n_name".isin("NATION_3", "NATION_7"))),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        val cusN = Tables(s, dir, "customer")
          .join(broadcast(Tables(s, dir, "nation")
            .filter($"n_name".isin("NATION_3", "NATION_7"))),
            $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"n_name".as("cust_nation"))
        // Both broadcast dims apply BELOW the fact-fact shuffle: only
        // the ~2/25 of lineitem with a qualifying supplier and the
        // ~2/25 of orders with a qualifying customer ever exchange.
        val lean = Tables(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(supN), $"l_suppkey" === $"s_suppkey")
        val ord = Tables(s, dir, "orders")
          .join(broadcast(cusN), $"o_custkey" === $"c_custkey")
        lean.join(ord, $"l_orderkey" === $"o_orderkey")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation",
            year($"l_shipdate").cast("long").as("l_year"))
          .agg(Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
            .as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              WHERE sn.n_name IN ('NATION_3', 'NATION_7')
                AND cn.n_name IN ('NATION_3', 'NATION_7')
                AND sn.n_name <> cn.n_name
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q6 through the PURE SQL front door: the query is submitted
    // as SQL TEXT over a registered temp view — proving the engine's
    // second entry point (spark.sql) yields the same Catalyst plan and
    // hash-exact results as the DataFrame API. Decimal-cast sum per
    // the Det contract; predicates all push to the parquet scan.
    GQuery("q6_forecast_revenue",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("li_q6")
        s.sql("""
          SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                   AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                 COUNT(*) AS n_rows
          FROM li_q6
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            AND l_discount BETWEEN 0.03 AND 0.07
            AND l_quantity < 24
        """)
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_rows
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                AND l_discount BETWEEN 0.03 AND 0.07
                AND l_quantity < 24""")),

    // Bloom-filter semi-join reduction (ops/BloomPrefilter): the scale
    // path for fact ⋈ dim(filtered) when the dim KEY SET fits a few MB
    // of bloom bits but the dim rows are past the broadcast threshold.
    // A blocked bloom over the filtered order keys (one
    // map-side-combined treeReduce pass) probes lineitem through a
    // codegen expression BEFORE the join's exchange — non-matching fact
    // rows never shuffle. Exact-superset semantics: false positives are
    // removed by the real join, so the oracle is the PLAIN join SQL.
    // The filter is sized from parquet footer row counts (zero Spark
    // jobs), 1/4 of orders for a 1-of-5 priority (overprovisioned;
    // undersizing only raises fpp, never loses rows).
    GQuery("join_bloom_prefilter",
      (s, dir) => {
        import s.implicits._
        val urgent = Tables(s, dir, "orders")
          .filter($"o_orderpriority" === "1-URGENT" &&
            $"o_totalprice" > 150000.0)
        val expected = math.max(64L,
          graft.ops.AnnSearch.parquetRowCount(s, s"$dir/orders.parquet") / 4)
        val lean = graft.ops.BloomPrefilter.semiReduce(
          Tables(s, dir, "lineitem"), "l_orderkey",
          urgent, "o_orderkey", expected, fpp = 0.01)
        lean.join(urgent, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_items"),
            Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
              .as("revenue"))
          .orderBy($"o_orderkey")
      },
      Some(s"""SELECT o_orderkey, COUNT(*) AS n_items,
              ${Det.sql.dsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
              GROUP BY o_orderkey ORDER BY o_orderkey"""))
  ,

    // TPC-H Q10 (returned-item reporting): top-20 customers by lost
    // revenue from returns in one quarter. Scale shape: both date and
    // returnflag predicates push to the parquet scans; the one
    // fact-fact shuffle is then bloom-REDUCED — the quarter keeps only
    // ~4% of orders, so probing lineitem against a bloom of the
    // surviving order keys BELOW its exchange cuts the big side's
    // shuffle ~25× (measured at sf10: 60 M-row lineitem, the exchange
    // carries ~0.8 M rows instead of 20 M). False positives are
    // removed by the real join — exact-superset semantics, plain-SQL
    // oracle. Customer joins the (already aggregated, small) side and
    // nation is a broadcast. The final top-20 is TakeOrderedAndProject
    // — no global sort. Revenue ranking must be deterministic for the
    // oracle, so the sort key is the EXACT decimal sum (not its double
    // cast) with c_custkey as tie-break.
    GQuery("q10_returned_item",
      (s, dir) => {
        import s.implicits._
        val ord = Tables(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey")
        // Bloom sized from the parquet footer count (zero Spark jobs):
        // the quarter is ~1/27 of orders; /16 overprovisions (under-
        // sizing only raises fpp, never loses rows).
        val expected = math.max(64L,
          graft.ops.AnnSearch.parquetRowCount(s, s"$dir/orders.parquet") / 16)
        val ret = graft.ops.BloomPrefilter.semiReduce(
            Tables(s, dir, "lineitem").filter($"l_returnflag" === "R"),
            "l_orderkey", ord, "o_orderkey", expected, fpp = 0.01)
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        val rev = ret.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev_dec"))
        rev.join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"c_name", $"n_name",
            $"rev_dec".cast("double").as("revenue"), $"rev_dec")
          .orderBy($"rev_dec".desc, $"c_custkey")
          .limit(20)
          .drop("rev_dec")
      },
      Some("""SELECT c_custkey, c_name, n_name,
                CAST(rev_dec AS DOUBLE) AS revenue
              FROM (
                SELECT o_custkey,
                  SUM(CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(18,4))) AS rev_dec
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
                GROUP BY o_custkey) r
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              ORDER BY rev_dec DESC, c_custkey LIMIT 20"""))
  )
}
