package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrderLayout

/** Two-dimensional Z-order layout contract (mirrors RangeLayoutSpec,
  * ADVICE r8): box reads must equal the unpartitioned truth — the
  * interleave/pruning arithmetic is exactly where an off-by-one
  * silently drops rows — plus sidecar adversarial cases and the
  * type-dispatch scenarios that motivated the driver-side comparator.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_zorder").toString + "/t"

  private def ordersLayout(): String = {
    val path = tmp()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    ZOrderLayout.write(orders, path,
      "o_orderdate", (1996 to 2001).map(y => s"$y-01-01"),
      "o_totalprice", Seq("50000", "100000", "200000", "400000"))
    path
  }

  test("box read equals the unpartitioned truth (several boxes)") {
    val path = ordersLayout()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dtX = orders.schema("o_orderdate").dataType
    def truth(xLo: String, xHi: String, yLo: String, yHi: String): Long =
      orders.filter(
        col("o_orderdate") >= lit(xLo).cast(dtX) &&
          col("o_orderdate") < lit(xHi).cast(dtX) &&
          col("o_totalprice") >= yLo.toDouble &&
          col("o_totalprice") < yHi.toDouble).count()
    val boxes = Seq(
      // interior box
      ("1997-03-01", "1998-06-01", "75000", "250000"),
      // box edges exactly ON division boundaries (off-by-one bait)
      ("1997-01-01", "1999-01-01", "100000", "400000"),
      // box entirely below the first / above the last division
      ("1990-01-01", "1995-06-01", "0", "50000"),
      ("2001-06-01", "2009-01-01", "400000", "9999999"),
      // degenerate-thin boxes
      ("1997-01-01", "1997-01-02", "0", "9999999"),
      ("1990-01-01", "2009-01-01", "99999", "100001"))
    boxes.foreach { case (xl, xh, yl, yh) =>
      val want = truth(xl, xh, yl, yh)
      val got = ZOrderLayout.read(spark, path, xl, xh, yl, yh).count()
      assert(got === want, s"box [$xl,$xh)x[$yl,$yh): got $got want $want")
    }
    // At least one non-empty box, or the suite proves nothing.
    assert(truth("1997-03-01", "1998-06-01", "75000", "250000") > 0)
  }

  test("read prunes cells via PartitionFilters (directory-level, not row)") {
    val path = ordersLayout()
    val tight = ZOrderLayout.read(spark, path,
      "1997-03-01", "1997-06-01", "75000", "90000")
    val plan = tight.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("__zb"),
      s"z-cell IN-list must be a PARTITION filter (file-listing time):\n$plan")
    // And the enumerated cell list must be a strict subset of the layout.
    val allCells = spark.read.parquet(path)
      .select("__zb").distinct().count()
    val cellsInFilter = "\\d+".r.findAllIn(
      pf.substring(pf.indexOf("__zb"))).size
    assert(cellsInFilter < allCells,
      s"tight box must list strictly fewer cells ($cellsInFilter) than " +
        s"the layout holds ($allCells)")
  }

  test("STRING column with numeric-looking values buckets lexicographically") {
    // The round-8 advice scenario: divisions {"12","9"} on a StringType
    // column. Driver-side enumeration must match the in-plan string
    // comparison ("10" < "12" < "9" lexicographically) — a numeric
    // dispatch on the VALUES would prune cells holding matching rows.
    import spark.implicits._
    val df = (1 to 99).map(i => (i.toString, i.toLong)).toDF("sv", "k")
    val path = tmp()
    ZOrderLayout.write(df, path, "sv", Seq("12", "9"), "k", Seq("50"))
    val want = df.filter($"sv" >= "1" && $"sv" < "5" && $"k" >= 0L && $"k" < 100L)
      .count()
    val got = ZOrderLayout.read(spark, path, "1", "5", "0", "100").count()
    assert(got === want && want > 0)
  }

  test("64-bit integer boundaries beyond 2^53 compare exactly") {
    // 2^53 = 9007199254740992: doubles cannot distinguish ±1 around it,
    // BigDecimal must. A double-based driver comparison would put the
    // boundary value in the wrong bucket and prune it away.
    import spark.implicits._
    val base = 9007199254740992L
    val df = Seq(base - 2, base - 1, base, base + 1, base + 2)
      .map(v => (v, 1.0)).toDF("big", "y")
    val path = tmp()
    ZOrderLayout.write(df, path, "big", Seq((base + 1).toString), "y", Seq("0.5"))
    val got = ZOrderLayout.read(spark, path,
      base.toString, (base + 1).toString, "0", "2").count()
    assert(got === 1L, s"exactly the row big=$base must survive, got $got")
  }

  test("a division whose text is 'colY' cannot confuse the sidecar parse") {
    import spark.implicits._
    val df = Seq(("apple", 1.0), ("colZ", 2.0), ("zebra", 3.0)).toDF("s", "y")
    val path = tmp()
    // "colY" is a legitimate x-division for a string column; the
    // self-describing nX field keeps the parse positional.
    ZOrderLayout.write(df, path, "s", Seq("colY"), "y", Seq("1.5"))
    val sc = ZOrderLayout.readSidecar(spark, path)
    assert(sc.contains(("s", Seq("colY"), "y", Seq("1.5"))))
    assert(ZOrderLayout.read(spark, path, "a", "z", "0", "9").count() === 2)
  }

  test("unsorted or type-invalid divisions refuse at write time") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("x", "y")
    // ("12","9") is lexicographically sorted but NOT numerically — for a
    // LongType column the type-dispatched validation must refuse it.
    intercept[IllegalArgumentException] {
      ZOrderLayout.write(df, tmp(), "x", Seq("12", "9"), "y", Seq("1"))
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.write(df, tmp(), "x", Seq("notanumber"), "y", Seq("1"))
    }
  }

  test("truncated sidecar fails with the malformed message, not an index error") {
    val path = ordersLayout()
    val p = new org.apache.hadoop.fs.Path(path, ZOrderLayout.SidecarName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val full = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val cut = full.substring(0, full.lastIndexOf('"'))
    val out = fs.create(p, true)
    try out.write(cut.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      ZOrderLayout.readSidecar(spark, path)
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("sidecar-less path refuses the read") {
    val path = ordersLayout()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, ZOrderLayout.SidecarName),
      false)
    intercept[IllegalStateException] {
      ZOrderLayout.read(spark, path, "1997-01-01", "1998-01-01", "0", "99999")
    }
  }
}
