package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeLayout

/** Divisions-sidecar contract for the persisted range layout: the
  * write-time boundaries travel WITH the data, so a reader can never
  * prune directories with guessed boundaries that silently drop
  * matching rows (the dask `divisions`-with-the-collection guarantee).
  */
class RangeLayoutSpec extends SparkSpec {

  private def layout(): (String, Seq[String]) = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_rangelayout").toString + "/orders"
    val divisions = (1996 to 2001).map(y => s"$y-01-01")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    RangeLayout.write(orders, path, "o_orderdate", divisions)
    (path, divisions)
  }

  test("write persists divisions; sidecar round-trips exactly") {
    val (path, divisions) = layout()
    assert(RangeLayout.readSidecar(spark, path)
      .contains(("o_orderdate", divisions)))
  }

  test("sidecar-loading read equals explicit-divisions read and the truth") {
    val (path, divisions) = layout()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dt = orders.schema("o_orderdate").dataType
    val expected = orders
      .filter(col("o_orderdate") >= lit("1997-03-01").cast(dt) &&
        col("o_orderdate") < lit("1997-06-01").cast(dt))
      .count()
    assert(expected > 0, "window must be non-empty for the test to bite")
    assert(RangeLayout.read(spark, path, "1997-03-01", "1997-06-01")
      .count() === expected)
    assert(RangeLayout.read(spark, path, "o_orderdate", divisions,
      "1997-03-01", "1997-06-01").count() === expected)
  }

  test("mismatched caller divisions throw instead of dropping rows") {
    val (path, divisions) = layout()
    // Shifted boundaries: without validation this prunes to the WRONG
    // directories and returns a silently short answer.
    val shifted = divisions.map(_.replace("-01-01", "-07-01"))
    val e = intercept[IllegalArgumentException] {
      RangeLayout.read(spark, path, "o_orderdate", shifted,
        "1997-03-01", "1997-06-01")
    }
    assert(e.getMessage.contains("divisions mismatch"))
    // Wrong column name is equally a desync.
    intercept[IllegalArgumentException] {
      RangeLayout.read(spark, path, "o_totalprice", divisions,
        "1997-03-01", "1997-06-01")
    }
  }

  test("truncated sidecar fails with the malformed message, not an index error") {
    val (path, _) = layout()
    val p = new org.apache.hadoop.fs.Path(path, RangeLayout.SidecarName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val full = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    // Cut mid-string-literal: the parser must fall through to the
    // malformed-sidecar require, not throw StringIndexOutOfBoundsException.
    val cut = full.substring(0, full.lastIndexOf('"'))
    val out = fs.create(p, true)
    try out.write(cut.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      RangeLayout.readSidecar(spark, path)
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("sidecar-less path refuses the self-loading read") {
    val (path, _) = layout()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, RangeLayout.SidecarName),
      false)
    intercept[IllegalStateException] {
      RangeLayout.read(spark, path, "1997-03-01", "1997-06-01")
    }
    // Legacy layouts (pre-sidecar) still work via the explicit overload.
    assert(RangeLayout.read(spark, path, "o_orderdate",
      (1996 to 2001).map(y => s"$y-01-01"),
      "1997-03-01", "1997-06-01").count() > 0)
  }
}
