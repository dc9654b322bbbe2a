package graft

import org.apache.spark.sql.functions._

import graft.functions.LongBloom
import graft.ops.BloomPrefilter

/** The bloom prefilter must be an exact SUPERSET filter (zero false
  * negatives — anything else silently drops join rows), with a false
  * positive rate near the provisioned target, and its probe must sit
  * BELOW the join's exchange in the physical plan (the whole point:
  * non-matching fact rows never shuffle).
  */
class BloomPrefilterSpec extends SparkSpec {

  test("provisioning: sizes grow with n, k clamped to [1,8], whole blocks") {
    val (w1, k1) = LongBloom.provision(1000, 0.01)
    val (w2, _) = LongBloom.provision(1000000, 0.01)
    assert(w1 % LongBloom.WordsPerBlock === 0)
    assert(w2 > w1 * 500)
    assert(k1 >= 1 && k1 <= 8)
    intercept[IllegalArgumentException](LongBloom.provision(0, 0.01))
    intercept[IllegalArgumentException](LongBloom.provision(10, 1.5))
  }

  test("no false negatives ever; fpp within 4x of target") {
    val n = 20000
    val (words, k) = LongBloom.provision(n, 0.01)
    val bits = new Array[Long](words)
    var i = 0
    while (i < n) { LongBloom.insert(bits, k, i * 7L + 3); i += 1 }
    i = 0
    while (i < n) {
      assert(LongBloom.contains(bits, k, i * 7L + 3), s"false negative at $i")
      i += 1
    }
    // disjoint probe set: negative keys, measure fp rate
    var fp = 0
    i = 0
    while (i < n) { if (LongBloom.contains(bits, k, -1L - i)) fp += 1; i += 1 }
    val rate = fp.toDouble / n
    // blocked blooms trade a small fpp factor for one-cache-line probes
    assert(rate < 0.04, s"fpp $rate vs target 0.01")
  }

  test("prefiltered join equals plain join (distributed, real tables)") {
    import spark.implicits._
    val orders = graft.engine.Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    val fact = graft.engine.Tables(spark, sfDir, "lineitem")
    val lean = BloomPrefilter.semiReduce(fact, "l_orderkey",
      orders, "o_orderkey", expectedItems = 4096)
    // superset: every surviving-join row retained
    val plainJoin = fact.join(orders, $"l_orderkey" === $"o_orderkey").count()
    val leanJoin = lean.join(orders, $"l_orderkey" === $"o_orderkey").count()
    assert(leanJoin === plainJoin)
    // and the prefilter really dropped the bulk of the fact side
    val kept = lean.count().toDouble / fact.count()
    assert(kept < 0.35, s"prefilter kept $kept of fact rows (expected ~0.2)")
  }

  test("probe sits below the exchange on the fact side of a shuffle join") {
    import spark.implicits._
    val orders = graft.engine.Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    val fact = graft.engine.Tables(spark, sfDir, "lineitem")
    val lean = BloomPrefilter.semiReduce(fact, "l_orderkey",
      orders, "o_orderkey", expectedItems = 4096)
    // force a shuffle join (the regime the op exists for)
    val joined = lean.hint("merge").join(orders, $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(2000))
    val probeAt = plan.indexOf("bloom_might_contain")
    val exchangeAt = plan.indexOf("Exchange")
    assert(exchangeAt >= 0 && probeAt > exchangeAt,
      "probe must appear under (after, in tree print order) the exchange:\n" +
        plan.take(2000))
    // and the probe compiles into whole-stage codegen (no interpreted row loop)
    assert(!plan.contains("BatchEvalPython"))
  }
}
