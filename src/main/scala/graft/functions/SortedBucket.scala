package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static binary-search kernels referenced from generated code (same
  * pattern as [[LongBloom]]): keep the search out of the generated
  * source so it JITs once and stays hot across whole-stage fragments.
  */
object SortedBucketSearch {
  /** First index i with v <= arr[i]; arr.numElements() if none — i.e.
    * #{k: arr[k] < v}, the bucket id of v among sorted cut points. */
  def searchDouble(v: Double, arr: ArrayData): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= arr.getDouble(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  def searchLong(v: Long, arr: ArrayData): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= arr.getLong(mid)) hi = mid else lo = mid + 1
    }
    lo
  }
}

/** `sorted_bucket(v, bounds)` — the bucket id of `v` among sorted cut
  * points: #{k: bounds[k] < v}, evaluated as an O(log n) binary search
  * inside whole-stage codegen. Replaces the broadcast range-join
  * formulation of bucket assignment in
  * [[graft.ops.DistributedSelect]]: identical tie semantics (a value
  * equal to a boundary lands LEFT of it), comparisons in the column's
  * own physical type (double or long — no cross-type rounding), ~ns
  * per row instead of a nested-loop join against `buckets` ranges.
  * The bounds array is a regular runtime input (the broadcast one-row
  * sketch result), so the whole selection stays ONE declarative plan
  * with no driver-side actions.
  */
case class SortedBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_bucket expects (double, array<double>) or (long, array<long>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_bucket"

  private def isDouble = left.dataType == DoubleType

  override def nullSafeEval(v: Any, arr: Any): Any =
    if (isDouble)
      SortedBucketSearch.searchDouble(v.asInstanceOf[Double],
        arr.asInstanceOf[ArrayData])
    else
      SortedBucketSearch.searchLong(v.asInstanceOf[Long],
        arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "searchDouble" else "searchLong"
    defineCodeGen(ctx, ev, (v, arr) =>
      s"graft.functions.SortedBucketSearch.$fn($v, $arr)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
