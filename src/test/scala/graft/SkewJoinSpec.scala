package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.SkewJoin

/** Salted join must be result-identical to the plain inner join. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join equals plain inner join") {
    val ev = Tables(spark, sfDir, "events")
    val cust = Tables(spark, sfDir, "customer")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "c_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val plain = canon(ev.join(cust, ev("user_id") === cust("c_custkey")))
    val salted = canon(SkewJoin.saltedInner(ev, cust, "user_id", "c_custkey",
      ev("event_id"), salts = 8))
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salting spreads a hot key over multiple salt values") {
    import spark.implicits._
    val hot = Seq.fill(1000)(42L).toDF("k")
    val salted = hot.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)).cast("int"))
    assert(salted.select("__salt").distinct().count() > 1)
  }
}
