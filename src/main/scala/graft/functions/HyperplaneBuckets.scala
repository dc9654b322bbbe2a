package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket ids of an embedding in ONE fused,
  * codegen'd pass: `tables` buckets of `bits` sign-bits each.
  *
  * The composable form (one `aggregate(zip_with(e, lit(plane), *))` HOF
  * chain per hyperplane) evaluates tables×bits interpreted loops and
  * allocates an intermediate array for each — at 20 tables × 3 bits
  * that is 60 allocations and 60 lambda-driven traversals per row, the
  * dominant cost of LSH candidate generation at scale. This expression
  * walks the plane matrix once inside whole-stage codegen: zero
  * allocation beyond the output array, fixed index-order accumulation
  * (deterministic everywhere).
  *
  * Plane entries are ±1 drawn from `java.util.Random(seed)` in
  * (table, bit, dim) order — EXACTLY the sequence the composable
  * implementation used, so bucket values (and every recall measurement
  * made with them) are unchanged.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int,
                             dim: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  /** Flattened ±1 plane matrix, laid out [t][b][i] → t*bits*dim + b*dim + i. */
  @transient private lazy val planes: Array[Double] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables * bits * dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val m = math.min(e.numElements(), dim)
    val out = new Array[Int](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var bk = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < m) { dot += e.getDouble(i) * planes(off + i); i += 1 }
        if (dot > 0) bk |= 1 << b
        off += dim
        b += 1
      }
      out(t) = bk
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, e => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bk = ctx.freshName("bk")
      s"""
         |int $m = java.lang.Math.min($e.numElements(), $dim);
         |int[] $out = new int[$tables];
         |int $off = 0;
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bk = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $m; $i++) {
         |      $dot += $e.getDouble($i) * $planesRef[$off + $i];
         |    }
         |    if ($dot > 0) $bk |= 1 << $b;
         |    $off += $dim;
         |  }
         |  $out[$t] = $bk;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
