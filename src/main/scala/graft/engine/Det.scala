package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for hash-matched oracles (SURVEY.md §7 landmines).
  *
  * `SUM(double)` is order-dependent in the last ulp, and Spark's partial
  * aggregation order differs from DuckDB's scan order. The fix used by
  * every graded aggregate: cast to an exact DECIMAL *before* summing
  * (associative, order-free), then cast the exact result back to DOUBLE
  * (round-to-nearest is identical in both engines). AVG is defined as
  * exact-decimal-sum / count in IEEE double arithmetic, identical on
  * both sides. The matching DuckDB SQL fragments live in [[Det.sql]].
  */
object Det {
  /** Order-independent sum of a double column, exact at `scale` decimals. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, in double math. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** DuckDB-side fragments kept textually adjacent so both engines stay in sync. */
  object sql {
    def dsum(x: String, scale: Int = 2): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"
    def davg(x: String, scale: Int = 2): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($x)"
  }
}
