package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §7 / 100 TB notes).
  *
  * A hash join on a hot key puts the whole key's volume on one task.
  * Salting splits each left-side key into `salts` sub-keys (a
  * deterministic hash of a caller-chosen column — no RNG, so results
  * are reproducible), and replicates the right side `salts` times, so
  * the hot key's rows spread over `salts` tasks. AQE's skew-join
  * handles moderate skew automatically; explicit salting is the tool
  * for the pathological keys AQE's split thresholds miss.
  *
  * Join semantics are exactly inner equi-join: every left row meets
  * every right row of its key exactly once (on its own salt replica).
  */
object SkewJoin {

  def saltedInner(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  saltSrc: Column, salts: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt_r",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && col("__salt") === col("__salt_r"))
      .drop("__salt", "__salt_r")
  }
}
