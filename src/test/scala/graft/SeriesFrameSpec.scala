package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{SeriesFrame, StreamFrame, Tables, ZipIo}

/** The single-column veneer and the zip container round-trip. */
class SeriesFrameSpec extends SparkSpec {

  private def events = new StreamFrame(Tables(spark, sfDir, "events"))

  test("series terminal aggregates match the DataFrame API") {
    import spark.implicits._
    val viaSeries = events("value").astype("decimal(18,2)").sum()
      .collect().head.getDecimal(0)
    val direct = Tables(spark, sfDir, "events")
      .agg(sum($"value".cast(DecimalType(18, 2)))).collect().head.getDecimal(0)
    assert(viaSeries === direct)
    assert(events("user_id").nunique().columns.toSeq === Seq("user_id_nunique"))
    assert(events("value").mean().collect().head.getDouble(0) ===
      Tables(spark, sfDir, "events").agg(avg($"value")).collect().head.getDouble(0))
  }

  test("series transformations compose lazily and prune the scan") {
    val s = events("value").abs.+(1.0).astype("long").rename("v")
    assert(s.toDF().columns.toSeq === Seq("v"))
    // only `value` is read from the 5-column table
    val scan = s.toDF().queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("value") && !scan.contains("event_type"), scan)
  }

  test("series value_counts orders by frequency then value") {
    val vc = events("event_type").valueCounts().collect()
    val ns = vc.map(_.getLong(1))
    assert(ns.sorted.reverse.toSeq === ns.toSeq)
  }

  test("zip round-trip preserves rows and schema") {
    import spark.implicits._
    val path = graft.engine.Scratch.dir("spec_zip") + "/nation.zip"
    val src = Tables(spark, sfDir, "nation")
    ZipIo.writeZip(src, path)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = ZipIo.readZip(spark, path, schema)
    assert(back.count() === src.count())
    val a = src.select($"n_nationkey", $"n_name").orderBy($"n_nationkey").collect()
    val b = back.select($"n_nationkey", $"n_name").orderBy($"n_nationkey").collect()
    assert(a.toSeq === b.toSeq)
  }
}
