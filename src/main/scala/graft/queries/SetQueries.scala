package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §2.6 sort / limit / set ops. Global sort range-partitions by sampled
  * bounds (what dask sort_values does); limit-after-sort is top-k.
  * `concat_cols` (pandas concat axis=1) is non-relational: it is
  * expressed as a deterministic row-number zip — the only scale-safe
  * reading of positional alignment.
  */
object SetQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    GQuery("sort",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey""")),

    GQuery("limit",
      (s, dir) => Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(50),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_orderkey LIMIT 50""")),

    // reference `head` short-circuit: NO sort — a bare limit compiles to
    // CollectLimit, which stops the scan after n rows instead of
    // reading the table (PlanSpec-asserted). Determinism for the oracle
    // comes from bounding n by the filtered row count (all 5 region
    // rows), not from ordering; the re-sort after head is only for the
    // hash compare.
    GQuery("head",
      (s, dir) => {
        new graft.engine.StreamFrame(Tables(s, dir, "region"))
          .head(5).toDF().orderBy("r_regionkey")
      },
      Some("""SELECT * FROM (SELECT * FROM region LIMIT 5) t
              ORDER BY r_regionkey""")),

    GQuery("union",
      (s, dir) => {
        import s.implicits._
        val c = Tables(s, dir, "customer")
          .select($"c_custkey".as("key"), lit("cust").as("src"))
        val sup = Tables(s, dir, "supplier")
          .select($"s_suppkey".as("key"), lit("supp").as("src"))
        c.unionByName(sup).orderBy($"key", $"src")
      },
      Some("""SELECT * FROM (
                SELECT c_custkey AS key, 'cust' AS src FROM customer
                UNION ALL
                SELECT s_suppkey AS key, 'supp' AS src FROM supplier) t
              ORDER BY key, src""")),

    GQuery("intersect",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer").select($"c_custkey".as("key"))
          .intersect(Tables(s, dir, "events").select($"user_id".as("key")))
          .orderBy($"key")
      },
      Some("""SELECT c_custkey AS key FROM customer
              INTERSECT SELECT user_id FROM events ORDER BY key""")),

    GQuery("except",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer").select($"c_custkey".as("key"))
          .except(Tables(s, dir, "events").select($"user_id".as("key")))
          .orderBy($"key")
      },
      Some("""SELECT c_custkey AS key FROM customer
              EXCEPT SELECT user_id FROM events ORDER BY key""")),

    // .tail(n): last-k by a total order = top-k on the reversed order,
    // re-sorted ascending (pandas tail semantics need an order column).
    GQuery("tail",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey".desc)
          .limit(20)
          .orderBy($"o_orderkey")
      },
      Some("""SELECT * FROM (
                SELECT o_orderkey, o_totalprice FROM orders
                ORDER BY o_orderkey DESC LIMIT 20) t
              ORDER BY o_orderkey""")),

    // pandas concat(axis=1): positional zip via deterministic row ids.
    // Each side gets its global row number from
    // DistributedSelect.withRangeRowNumber — range-repartition on the
    // order column, per-partition counts → broadcast offsets, parallel
    // per-partition windows — NEVER a no-partition row_number window
    // over the data (the single-task funnel that dies at 100 TB; the
    // only no-partition window in the plan sorts the ≤32-row
    // partition-counts frame, PlanSpec-asserted). The zip itself is an
    // equi-join on rn, which shuffles on the row id like any join key.
    GQuery("concat_cols",
      (s, dir) => {
        import s.implicits._
        val r = graft.ops.DistributedSelect.withRangeRowNumber(
            Tables(s, dir, "region").select($"r_name"), Seq($"r_name"))
          .select($"rn", $"r_name")
        val n = graft.ops.DistributedSelect.withRangeRowNumber(
            Tables(s, dir, "nation").filter($"n_nationkey" < 5).select($"n_name"),
            Seq($"n_name"))
          .select($"rn", $"n_name")
        r.join(n, "rn").select($"rn", $"r_name", $"n_name").orderBy($"rn")
      },
      Some("""WITH r AS (SELECT ROW_NUMBER() OVER (ORDER BY r_name) AS rn, r_name FROM region),
                   n AS (SELECT ROW_NUMBER() OVER (ORDER BY n_name) AS rn, n_name
                         FROM nation WHERE n_nationkey < 5)
              SELECT r.rn AS rn, r_name, n_name FROM r JOIN n USING (rn) ORDER BY rn"""))
  )
}
