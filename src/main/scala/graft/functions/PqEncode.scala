package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization ENCODER: given a (normalized)
  * vector and the codebook tensor `books[m][k][dsub]`, emit the
  * array<int> of 1-based nearest-centroid indices per subspace —
  * `PqSearch.encode`'s hot loop as one fused m×k×dsub scan.
  *
  * The composable form (m staged per-subspace `transform`+`aggregate`
  * columns) is interpreted (HOFs are CodegenFallback) and pays boxing
  * + per-subspace ArrayData allocation on EVERY corpus row — and
  * encode runs once per corpus row at ingest, the biggest row count
  * in the PQ pipeline. Ties break to the FIRST minimum (strict <),
  * matching `array_position(d, array_min(d))` exactly — the staged
  * form and this expression are interchangeable bit-for-bit
  * (spec-pinned). dsub is derived from the CODEBOOK (the fitted
  * model's first centroid length), never from the input vector: a
  * vector whose length is not exactly m×dsub — including a different
  * multiple of m than the fitted dim — yields NULL rather than
  * reading past centroid bounds and emitting garbage codes. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<double> vec, array<array<array<double>>> " +
        s"books), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val m = books.numElements()
    if (m == 0 || books.getArray(0).numElements() == 0) return null
    val dsub = books.getArray(0).getArray(0).numElements()
    if (vec.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books.getArray(j)
      val k = book.numElements()
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = book.getArray(c)
        var d = 0.0; var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(j * dsub + t) - cent.getDouble(t)
          d += diff * diff; t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best + 1
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, books) => {
      val m = ctx.freshName("m")
      val dsub = ctx.freshName("dsub")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val book = ctx.freshName("book")
      val cent = ctx.freshName("cent")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      val bad = ctx.freshName("badShape")
      // one complete Java statement per line: Spark's code-splitting
      // reformatter can drop a leading `||` continuation token when it
      // extracts this block into a method (janino then fails and the
      // expression silently falls back to interpreted eval)
      s"""
         |int $m = $books.numElements();
         |boolean $bad = ($m == 0) || ($books.getArray(0).numElements() == 0);
         |if (!$bad) { $bad = $vec.numElements() != $m * $books.getArray(0).getArray(0).numElements(); }
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $dsub = $books.getArray(0).getArray(0).numElements();
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    $ad $book = $books.getArray($j);
         |    int $best = -1; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $book.numElements(); $c++) {
         |      $ad $cent = $book.getArray($c);
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        double $diff = $vec.getDouble($j * $dsub + $t) - $cent.getDouble($t);
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best + 1;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
