package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** The reference's defining metamorphic invariant, generalized
  * (SURVEY.md §5.2): results must be independent of how the input is
  * chunked/partitioned. `op(df.repartition(n)) ≡ op(df.coalesce(1))`
  * as multisets, for the ops whose determinism the oracles rely on.
  */
class ChunkInvarianceSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val partitionings = Seq(1, 3, 17)

  test("decimal-sum aggregation is partition-invariant (bit-exact)") {
    val li = Tables(spark, sfDir, "lineitem")
    val ref = canon(li.coalesce(1).groupBy("l_returnflag")
      .agg(Det.dsum(col("l_extendedprice")).as("s")))
    partitionings.foreach { n =>
      val got = canon(li.repartition(n).groupBy("l_returnflag")
        .agg(Det.dsum(col("l_extendedprice")).as("s")))
      assert(got === ref, s"repartition($n) changed decimal sums")
    }
  }

  test("join results are partition-invariant") {
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders")
    val ref = canon(c.join(o, col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "o_orderkey"))
    partitionings.foreach { n =>
      val got = canon(c.repartition(n).join(o.repartition(n),
        col("c_custkey") === col("o_custkey")).select("c_custkey", "o_orderkey"))
      assert(got === ref)
    }
  }

  test("as-of join is partition-invariant") {
    import graft.ops.AsOfJoin
    val ev = Tables(spark, sfDir, "events")
    def asof(n: Int) = {
      val e = if (n == 0) ev.coalesce(1) else ev.repartition(n)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      canon(AsOfJoin.backward(p, c, "user_id", "ts", Seq("click_id")))
    }
    val ref = asof(0)
    partitionings.foreach(n => assert(asof(n) === ref, s"asof changed at n=$n"))
  }

  test("per-key ordered-window ops (RollingOps) are partition-invariant") {
    // ewm is the most rounding-sensitive of the family (32-term double
    // addition chain): the window shuffle re-clusters per key and the
    // expression tree is fixed, so results must be BIT-exact under any
    // input partitioning.
    val e = Tables(spark, sfDir, "events").filter("user_id < 20")
    def run(df: DataFrame): Seq[String] = canon(
      graft.ops.RollingOps.ewmMean(df, "value",
          Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "ewm"))
    val ref = run(e.coalesce(1))
    partitionings.foreach(n => assert(run(e.repartition(n)) === ref,
      s"ewm changed at repartition($n)"))
    def sess(df: DataFrame): Seq[String] = canon(
      graft.ops.RollingOps.sessionize(df, "ts", 1800L,
          Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "session_id"))
    val sref = sess(e.coalesce(1))
    partitionings.foreach(n => assert(sess(e.repartition(n)) === sref,
      s"sessionize changed at repartition($n)"))
  }

  test("raw double sum is NOT partition-stable but decimal sum is") {
    // Documents the hazard the decimal path exists for: with enough
    // partitionings, a raw double sum will drift in the last ulp at
    // least for some layout; the decimal sum never does. (We only
    // assert the decimal side — the raw drift is probabilistic.)
    val li = Tables(spark, sfDir, "lineitem")
    val sums = partitionings.map { n =>
      li.repartition(n).agg(Det.dsum(col("l_extendedprice"))).head.getDouble(0)
    }
    assert(sums.distinct.size === 1)
  }
}
