package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Native as-of join — the full Catalyst extension ladder for a whole
  * operator Spark lacks (brief §custom-operators path (c)): a logical
  * node, a planner strategy, and a physical merge operator.
  *
  * Semantics: for each left row, attach the payload of the LAST right
  * row with the same key and right.ts <= left.ts (backward inclusive
  * as-of; ties at equal ts resolved toward the max payload — identical
  * to [[graft.ops.AsOfJoin]] and its oracle).
  *
  * Physical design: both children hash-clustered on the key (ONE
  * shuffle each — EnsureRequirements co-partitions them exactly as for
  * a sort-merge join) and sorted by (key, ts[, payload]); the exec then
  * streams both sorted partitions through a single forward merge that
  * carries the latest right payload per key. O(n+m) per partition,
  * constant memory (one carried row), no union row-padding and no
  * window state — strictly less work than the union+window
  * construction, and the same scaling law as sort-merge join.
  */
object AsOfJoinNative {

  /** Backward as-of join; returns left columns + `rightCols` payloads.
    * Key and ts must be 64-bit-backed types (long / timestamp).
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Fresh aliases give the right side its own exprIds (self-join safe).
    val r = right.select(
      col(key).as("__r_key") +: col(ts).as("__r_ts") +:
        rightCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    val rOut = rPlan.output
    val node = AsOfJoinNode(
      lPlan, rPlan,
      lPlan.output.find(_.name == key).get,
      lPlan.output.find(_.name == ts).get,
      rOut.find(_.name == "__r_key").get,
      rOut.find(_.name == "__r_ts").get,
      rightCols.map(c => rOut.find(_.name == c).get))
    GraftSqlBridge.ofRows(spark, node)
  }

  private def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.exists(_.isInstanceOf[AsOfJoinPushdown.type]))
      spark.experimental.extraOptimizations = opts :+ AsOfJoinPushdown
  }
}

/** Optimizer rule: predicate pushdown THROUGH the custom node. Catalyst
  * cannot push filters past operators it doesn't know, so a filter on
  * as-of output would otherwise run after the join's shuffle; every
  * left row appears exactly once in the output with its left columns
  * unchanged, so any conjunct touching only left columns commutes with
  * the join and can run before the shuffle instead (payload conjuncts
  * must stay — they see nulls the left side doesn't have).
  */
object AsOfJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val leftRefs = a.left.outputSet
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(leftRefs))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Logical marker node: output = left columns + nullable payloads. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.payload,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // Hash-cluster both sides on the key (co-partitioned like SMJ) …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // … and sort within partitions: left by (key, ts); right additionally
  // by payload so "last at equal ts" is the max payload (the pinned
  // tie-break the oracle encodes).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.map(p => SortOrder(p, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val payloadExprs = payload
    val leftOut = left.output
    val rightOut = right.output
    val lKey = leftKey; val lTs = leftTs
    val rKey = rightKey; val rTs = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lExtract = UnsafeProjection.create(Seq(lKey, lTs), leftOut)
      val rExtract = UnsafeProjection.create(Seq(rKey, rTs), rightOut)
      val rPayload = UnsafeProjection.create(payloadExprs, rightOut)
      val nullPayload = new GenericInternalRow(payloadExprs.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      var hasCarried = false
      var carriedKey = 0L
      var carriedPayload: UnsafeRow = null
      lIter.map { l =>
        val lkv = lExtract(l)
        val lk = lkv.getLong(0); val lt = lkv.getLong(1)
        var advance = true
        while (advance && rBuf.hasNext) {
          val rkv = rExtract(rBuf.head)
          val rk = rkv.getLong(0)
          if (rk < lk || (rk == lk && rkv.getLong(1) <= lt)) {
            val rRow = rBuf.next()
            carriedKey = rk
            // iterator may reuse the row object → copy the carry
            carriedPayload = rPayload(rRow).copy()
            hasCarried = true
          } else advance = false
        }
        val p = if (hasCarried && carriedKey == lk) carriedPayload else nullPayload
        outProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
