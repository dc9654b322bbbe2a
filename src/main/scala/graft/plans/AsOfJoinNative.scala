package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
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
    * The key may be ANY orderable type (long, string, decimal, date, …)
    * — comparison goes through Catalyst's natural row ordering. The ts
    * must be a 64-bit-backed type (long / timestamp): the merge reads
    * it with getLong.
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsType = left.schema(ts).dataType
    require(Seq(LongType, TimestampType, TimestampNTZType).contains(tsType),
      s"as-of ts column `$ts` must be long/timestamp, got $tsType")
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
      // Only deterministic conjuncts may move below the node (Catalyst's
      // own pushdown rules do the same): a nondeterministic predicate —
      // e.g. rand()-based sampling on the join output — would select
      // different rows when re-evaluated pre-shuffle.
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(leftRefs))
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
    val keyType = leftKey.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Key rows are extracted separately from the ts so ANY orderable
      // key type (string/decimal/date/…) works: comparison goes through
      // Catalyst's natural row ordering instead of a hard-coded getLong
      // (null keys group together, matching the window construction's
      // partitionBy-null semantics).
      val lKeyProj = UnsafeProjection.create(Seq(lKey), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKey), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val rPayload = UnsafeProjection.create(payloadExprs, rightOut)
      val nullPayload = new GenericInternalRow(payloadExprs.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      var hasCarried = false
      var carriedKey: UnsafeRow = null
      var carriedPayload: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l).getLong(0)
        var advance = true
        while (advance && rBuf.hasNext) {
          val cmp = keyOrd.compare(rKeyProj(rBuf.head), lk)
          if (cmp < 0 || (cmp == 0 && rTsProj(rBuf.head).getLong(0) <= lt)) {
            val rRow = rBuf.next()
            // iterator and projections reuse row objects → copy the carry
            carriedKey = rKeyProj(rRow).copy()
            carriedPayload = rPayload(rRow).copy()
            hasCarried = true
          } else advance = false
        }
        val p = if (hasCarried && keyOrd.compare(carriedKey, lk) == 0) carriedPayload
                else nullPayload
        outProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
