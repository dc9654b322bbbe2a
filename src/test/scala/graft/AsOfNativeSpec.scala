package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

/** The native as-of physical operator: equality with the union+window
  * construction, null handling, and the plan shape it promises.
  */
class AsOfNativeSpec extends SparkSpec {

  private def sides = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    (p, c)
  }

  test("native as-of equals the union+window construction row-for-row") {
    val (p, c) = sides
    val viaWindow = AsOfJoin.backward(p, c, "user_id", "ts", Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val native = AsOfJoinNative.backward(p, c, "user_id", "ts", Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native === viaWindow)
    assert(native.nonEmpty)
  }

  test("native as-of plans the custom exec with one shuffle per side") {
    val (p, c) = sides
    val df = AsOfJoinNative.backward(p, c, "user_id", "ts", Seq("click_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("left-only filters push through the custom node (run pre-shuffle)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.plans.AsOfJoinNode
    val (p, c) = sides
    val df = AsOfJoinNative.backward(p, c, "user_id", "ts", Seq("click_id"))
      .filter(col("event_id") > 100) // references only left columns
    val opt = df.queryExecution.optimizedPlan
    val node = opt.collectFirst { case a: AsOfJoinNode => a }
    assert(node.isDefined, s"node eliminated?\n$opt")
    val filterBelow = node.get.left.collectFirst { case f: LFilter => f }
    assert(filterBelow.isDefined, s"filter not pushed below the as-of node:\n$opt")
    // and nothing is lost: result equals filter-after-join semantics
    val after = AsOfJoinNative.backward(p, c, "user_id", "ts", Seq("click_id"))
      .collect().filter(_.getLong(0) > 100).length
    assert(df.count() === after)
  }

  test("string keys take the native path and match the window construction") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", concat(lit("u"), $"user_id").as("k"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select(concat(lit("u"), $"user_id").as("k"), $"ts",
        $"event_id".as("click_id"))
    val viaWindow = AsOfJoin.backward(p, c, "k", "ts", Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val df = AsOfJoinNative.backward(p, c, "k", "ts", Seq("click_id"))
    val native = df.select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native === viaWindow)
    assert(native.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"string key fell off the native path:\n$plan")
  }

  test("left rows with no earlier right row get null payload") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 50L)).toDF("id", "k", "t")
    val r = Seq((10L, 60L, 7L)).toDF("k", "t", "pay")
    val out = AsOfJoinNative.backward(
        l.select($"id", $"k", $"t"), r, "k", "t", Seq("pay"))
      .select($"id", $"pay").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(out(1L) === Some(7L)) // t=100 >= 60
    assert(out(2L) === None)     // t=50 < 60: nothing earlier
  }

  test("ties at equal (key, ts) pick the max payload deterministically") {
    import spark.implicits._
    val l = Seq((1L, 5L, 100L)).toDF("id", "k", "t")
    val r = Seq((5L, 100L, 3L), (5L, 100L, 9L), (5L, 90L, 4L))
      .toDF("k", "t", "pay")
    val out = AsOfJoinNative.backward(
        l.select($"id", $"k", $"t"), r, "k", "t", Seq("pay"))
      .select($"pay").collect().head.getLong(0)
    assert(out === 9L)
  }
}
