package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nprobe` nearest k-means cells of an embedding, by COSINE, in
  * one fused codegen pass over a flat centroid matrix.
  *
  * This is the assignment kernel of the kmeans-blocked SemDeDup scale
  * path (ops/SemDedup.scala): its cost — n·k·dim multiplies for the
  * whole corpus — is one of the two terms that bound the blocked
  * near-dup join, so it must run at primitive-loop speed. The
  * composable form (`transform` over a typedLit centroid matrix with
  * an `aggregate(zip_with(...))` dot product per cell) evaluates k
  * interpreted HOF loops and allocates k intermediate arrays per row;
  * at k ≈ 2000 cells over 2 M vectors that is the difference between
  * seconds and minutes. Same design as [[HyperplaneBuckets]]: constant
  * matrix via `addReferenceObj`, fixed index-order accumulation,
  * deterministic everywhere.
  *
  * Cosine ranking without normalizing the input: `centroids` rows must
  * be UNIT vectors (the fitter normalizes), so ranking by raw dot
  * products IS ranking by cosine — the input's own norm scales every
  * dot identically. Ties break to the lower cell id; output cells are
  * in decreasing-similarity order (own cell first).
  */
case class NearestCells(child: Expression, centroids: Array[Double],
                        k: Int, dim: Int, nprobe: Int)
    extends UnaryExpression {

  require(k >= 1 && nprobe >= 1 && nprobe <= k && centroids.length == k * dim,
    s"bad NearestCells geometry: k=$k dim=$dim nprobe=$nprobe len=${centroids.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val m = math.min(e.numElements(), dim)
    val bestD = Array.fill(nprobe)(Double.NegativeInfinity)
    val bestC = Array.fill(nprobe)(-1)
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * dim
      var i = 0
      while (i < m) { dot += e.getDouble(i) * centroids(off + i); i += 1 }
      // insertion into the top-nprobe registers (strict >: ties keep
      // the earlier = lower cell id)
      var p = 0
      while (p < nprobe && dot <= bestD(p)) p += 1
      if (p < nprobe) {
        var q = nprobe - 1
        while (q > p) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
        bestD(p) = dot; bestC(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, e => {
      val m = ctx.freshName("m")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      s"""
         |int $m = java.lang.Math.min($e.numElements(), $dim);
         |double[] $bestD = new double[$nprobe];
         |int[] $bestC = new int[$nprobe];
         |java.util.Arrays.fill($bestD, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($bestC, -1);
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += $e.getDouble($i) * $centsRef[$off + $i];
         |  }
         |  int $p = 0;
         |  while ($p < $nprobe && $dot <= $bestD[$p]) $p++;
         |  if ($p < $nprobe) {
         |    for (int $q = $nprobe - 1; $q > $p; $q--) {
         |      $bestD[$q] = $bestD[$q - 1]; $bestC[$q] = $bestC[$q - 1];
         |    }
         |    $bestD[$p] = $dot; $bestC[$p] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
