package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Two-level (IVF-routed) variant of [[NearestCells]]: rank only the
  * leaves of the `pc` nearest COARSE groups instead of all k leaves.
  *
  * The flat assignment is n·k·dim multiplies, and the blocked-SemDeDup
  * contract sets k ≈ n/targetCell — so past a few hundred cells the
  * assignment term turns effectively quadratic in the corpus
  * (BASELINE.md round 11: 17.6 s of the sf100 incremental leg is this
  * one projection). Routing makes it n·(k1 + pc·k/k1)·dim with
  * k1 ≈ √k — ~3√k dots per row at pc=2 — at the standard IVF price:
  * a vector whose true nearest leaf lives under an unprobed coarse
  * group is misassigned. The coarse layer is built OVER THE SAME flat
  * centroids (driver-side grouping of the k leaf vectors, see
  * [[graft.ops.SemDedup.routedOf]]), so emitted ids are the SAME
  * global leaf ids as the flat expression, ranking among compared
  * leaves is dot-for-dot identical (same fixed index-order loops), and
  * ties break to the lower global leaf id exactly like the flat rule.
  *
  * Layout: `coarse` is k1 unit group centroids row-major;
  * `routedCents` holds the k leaf centroids REORDERED group-by-group;
  * `groupStart(g)..groupStart(g+1)` are group g's routed positions;
  * `leafGid(pos)` maps a routed position back to the global leaf id.
  */
case class NearestCellsRouted(child: Expression,
                              coarse: Array[Double], routedCents: Array[Double],
                              groupStart: Array[Int], leafGid: Array[Int],
                              k1: Int, k: Int, dim: Int,
                              pc: Int, nprobe: Int)
    extends UnaryExpression {

  require(k1 >= 1 && pc >= 1 && pc <= k1 && nprobe >= 1 && nprobe <= k &&
    coarse.length == k1 * dim && routedCents.length == k * dim &&
    groupStart.length == k1 + 1 && leafGid.length == k,
    s"bad NearestCellsRouted geometry: k1=$k1 k=$k dim=$dim pc=$pc nprobe=$nprobe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_routed expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells_routed"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val m = math.min(e.numElements(), dim)
    // pass 1: top-pc coarse groups (ties to lower group id)
    val gD = Array.fill(pc)(Double.NegativeInfinity)
    val gC = Array.fill(pc)(-1)
    var g = 0
    while (g < k1) {
      var dot = 0.0
      val off = g * dim
      var i = 0
      while (i < m) { dot += e.getDouble(i) * coarse(off + i); i += 1 }
      var p = 0
      while (p < pc && dot <= gD(p)) p += 1
      if (p < pc) {
        var q = pc - 1
        while (q > p) { gD(q) = gD(q - 1); gC(q) = gC(q - 1); q -= 1 }
        gD(p) = dot; gC(p) = g
      }
      g += 1
    }
    // pass 2: top-nprobe leaves among the probed groups' members,
    // ranked (dot desc, global leaf id asc) — the flat tie rule
    val bestD = Array.fill(nprobe)(Double.NegativeInfinity)
    val bestC = Array.fill(nprobe)(Int.MaxValue)
    var pi = 0
    while (pi < pc) {
      val grp = gC(pi)
      if (grp >= 0) {
        var pos = groupStart(grp)
        val end = groupStart(grp + 1)
        while (pos < end) {
          var dot = 0.0
          val off = pos * dim
          var i = 0
          while (i < m) { dot += e.getDouble(i) * routedCents(off + i); i += 1 }
          val gid = leafGid(pos)
          var p = 0
          while (p < nprobe &&
            (dot < bestD(p) || (dot == bestD(p) && gid > bestC(p)))) p += 1
          if (p < nprobe) {
            var q = nprobe - 1
            while (q > p) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
            bestD(p) = dot; bestC(p) = gid
          }
          pos += 1
        }
      }
      pi += 1
    }
    // fewer reachable leaves than nprobe cannot happen: pc groups hold
    // >= pc >= 1 leaves and nprobe <= probes <= total probed leaves by
    // the caller's contract; guard anyway by dropping unfilled slots
    val filled = bestC.takeWhile(_ != Int.MaxValue)
    new GenericArrayData(if (filled.length == nprobe) bestC else filled)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[]")
    val centsRef = ctx.addReferenceObj("routedCents", routedCents, "double[]")
    val gsRef = ctx.addReferenceObj("groupStart", groupStart, "int[]")
    val gidRef = ctx.addReferenceObj("leafGid", leafGid, "int[]")
    nullSafeCodeGen(ctx, ev, e => {
      val m = ctx.freshName("m")
      val gD = ctx.freshName("gD"); val gC = ctx.freshName("gC")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val g = ctx.freshName("g"); val off = ctx.freshName("off")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
      val pi = ctx.freshName("pi"); val grp = ctx.freshName("grp")
      val pos = ctx.freshName("pos"); val end = ctx.freshName("end")
      val gid = ctx.freshName("gid"); val nf = ctx.freshName("nf")
      val out = ctx.freshName("out")
      s"""
      final int $m = java.lang.Math.min($e.numElements(), $dim);
      final double[] $gD = new double[$pc];
      final int[] $gC = new int[$pc];
      java.util.Arrays.fill($gD, Double.NEGATIVE_INFINITY);
      java.util.Arrays.fill($gC, -1);
      for (int $g = 0; $g < $k1; $g++) {
        double $dot = 0.0;
        final int $off = $g * $dim;
        for (int $i = 0; $i < $m; $i++) {
          $dot += $e.getDouble($i) * $coarseRef[$off + $i];
        }
        int $p = 0;
        while ($p < $pc && $dot <= $gD[$p]) $p++;
        if ($p < $pc) {
          for (int $q = $pc - 1; $q > $p; $q--) {
            $gD[$q] = $gD[$q - 1]; $gC[$q] = $gC[$q - 1];
          }
          $gD[$p] = $dot; $gC[$p] = $g;
        }
      }
      final double[] $bestD = new double[$nprobe];
      final int[] $bestC = new int[$nprobe];
      java.util.Arrays.fill($bestD, Double.NEGATIVE_INFINITY);
      java.util.Arrays.fill($bestC, Integer.MAX_VALUE);
      for (int $pi = 0; $pi < $pc; $pi++) {
        final int $grp = $gC[$pi];
        if ($grp >= 0) {
          final int $end = $gsRef[$grp + 1];
          for (int $pos = $gsRef[$grp]; $pos < $end; $pos++) {
            double $dot = 0.0;
            final int $off = $pos * $dim;
            for (int $i = 0; $i < $m; $i++) {
              $dot += $e.getDouble($i) * $centsRef[$off + $i];
            }
            final int $gid = $gidRef[$pos];
            int $p = 0;
            while ($p < $nprobe &&
              ($dot < $bestD[$p] || ($dot == $bestD[$p] && $gid > $bestC[$p]))) $p++;
            if ($p < $nprobe) {
              for (int $q = $nprobe - 1; $q > $p; $q--) {
                $bestD[$q] = $bestD[$q - 1]; $bestC[$q] = $bestC[$q - 1];
              }
              $bestD[$p] = $dot; $bestC[$p] = $gid;
            }
          }
        }
      }
      int $nf = 0;
      while ($nf < $nprobe && $bestC[$nf] != Integer.MAX_VALUE) $nf++;
      final int[] $out = ($nf == $nprobe) ? $bestC
        : java.util.Arrays.copyOf($bestC, $nf);
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
