package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType}

/** Persisted TWO-dimensional data-skipping layout — the multi-column
  * generalization of [[RangeLayout]] (dask `set_index` prunes one
  * index; real lakehouse tables cluster on several: Delta/Iceberg
  * Z-ORDER, SURVEY.md §2.1/§4).
  *
  * Each dimension is range-bucketed by explicit sorted divisions
  * (bucket id = count of boundaries <= value, exactly dask's
  * divisions arithmetic), and the two bucket ids are BIT-INTERLEAVED
  * into a Morton/Z value that becomes the Hive partition column. The
  * interleave is what makes ONE directory tree serve BOTH predicates:
  * consecutive z values alternate x- and y-bits, so any (x-range ×
  * y-range) query box touches a compact set of z cells instead of
  * `all x-buckets` (what a lexicographic (x,y) sort would cost a
  * y-only predicate).
  *
  * Both the bucket arithmetic and the interleave are plain integer
  * Column expressions (shift/and/or — whole-stage codegen, no UDF),
  * and the read side recomputes the overlapping z cells CLIENT-SIDE
  * from the query box + the sidecar divisions, emitting them as an
  * IN-list filter on the partition column. Spark applies that at
  * file-LISTING time (`PartitionFilters`) — true directory pruning:
  * at 100 TB the driver lists the ~touched cells, not the table.
  * Within each surviving cell rows are sorted by (__zb, x, y) — the
  * partition column leads so Spark's planned write does not inject
  * its own sort on top and the per-cell (x,y) clustering survives to
  * the parquet row groups, where min/max statistics prune a second
  * time below the directory level.
  *
  * Divisions travel as strings (sidecar `_zorder.json`). The
  * driver-side bucket arithmetic dispatches on the COLUMN's Spark
  * type — numeric columns compare via BigDecimal (exact for 64-bit
  * integers, where a double round-trip is not), everything else
  * lexicographically (ISO dates/timestamps sort correctly as text) —
  * so it always agrees with the in-plan `lit(d).cast(dt)` comparison
  * regardless of whether a string column happens to hold
  * numeric-looking values.
  */
object ZOrderLayout {

  val SidecarName = "_zorder.json"

  /** Max buckets per dimension (8 bits each → z fits in 16 bits). */
  val MaxBuckets = 256

  /** Bucket id of `v` under `divisions` — in-plan version. */
  private def bucketCol(c: Column, divisions: Seq[String],
                        dt: DataType): Column =
    divisions.foldLeft(lit(0)) { (acc, d) =>
      acc + when(c >= lit(d).cast(dt), 1).otherwise(0)
    }

  /** Morton interleave of two 8-bit bucket ids — in-plan version.
    * x occupies even bit positions, y odd ones.
    */
  private def zCol(bx: Column, by: Column): Column =
    (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(bx, i).bitwiseAND(lit(1)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(lit(1)), 2 * i + 1))
    }

  /** Morton interleave — driver-side twin of [[zCol]] for the read
    * path's client-side cell enumeration. Kept adjacent so the two
    * can't drift.
    */
  def zValue(bx: Int, by: Int): Int = {
    var z = 0
    var i = 0
    while (i < 8) {
      z |= ((bx >> i) & 1) << (2 * i)
      z |= ((by >> i) & 1) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Driver-side comparison dispatched on the COLUMN's type, so bucket
    * enumeration can never disagree with the in-plan cast comparison:
    * numeric columns via BigDecimal (exact beyond 2^53 where a double
    * round-trip loses boundary values), everything else as text.
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case _: NumericType =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => a.compareTo(b)
  }

  /** Bucket id of value `v` under `divisions` — driver-side twin of
    * [[bucketCol]], same type dispatch.
    */
  def bucketId(divisions: Seq[String], v: String, dt: DataType): Int =
    divisions.count(d => cmp(dt, d, v) <= 0)

  /** Validate divisions against the column they bucket: sorted under
    * the column's own comparison, and (for numeric columns) parseable
    * as exact decimals — a non-numeric division against a numeric
    * column would cast to NULL in-plan and bucket garbage.
    */
  private def validateDivisions(which: String, divisions: Seq[String],
                                dt: DataType): Unit = {
    if (dt.isInstanceOf[NumericType]) divisions.foreach { d =>
      require(scala.util.Try(new java.math.BigDecimal(d)).isSuccess,
        s"$which division '$d' is not numeric but the column is $dt")
    }
    require(divisions.zip(divisions.drop(1)).forall { case (a, b) =>
      cmp(dt, a, b) < 0
    }, s"$which divisions must be strictly sorted under the column type ($dt)")
    require(divisions.size < MaxBuckets,
      s"at most ${MaxBuckets - 1} divisions per dimension (8-bit bucket ids)")
  }

  /** Write `df` under `path` Z-clustered on (`colX`, `colY`).
    * One cluster-by-cell shuffle + a per-cell (x,y) sort — the same
    * pay-once layout cost as `set_index`/OPTIMIZE ZORDER.
    */
  def write(df: DataFrame, path: String, colX: String, divX: Seq[String],
            colY: String, divY: Seq[String]): Unit = {
    val dtX = df.schema(colX).dataType
    val dtY = df.schema(colY).dataType
    validateDivisions("x", divX, dtX)
    validateDivisions("y", divY, dtY)
    val z = zCol(bucketCol(col(colX), divX, dtX),
      bucketCol(col(colY), divY, dtY))
    df.withColumn("__zb", z)
      .repartition(col("__zb"))
      // __zb leads: partitionBy requires partition-column order, so
      // sorting it ourselves keeps Spark from injecting a sort that
      // would not preserve the (x, y) clustering per cell.
      .sortWithinPartitions(col("__zb"), col(colX), col(colY))
      .write.mode("overwrite").partitionBy("__zb").parquet(path)
    writeSidecar(df.sparkSession, path, colX, divX, colY, divY)
  }

  /** Rows inside the half-open box [xLo, xHiEx) × [yLo, yHiEx),
    * listing ONLY the z cells whose bucket rectangle intersects the
    * box. Divisions come from the layout's own sidecar, so the read
    * cannot desync from the write-time boundaries.
    */
  def read(spark: SparkSession, path: String,
           xLo: String, xHiEx: String,
           yLo: String, yHiEx: String): DataFrame = {
    val (colX, divX, colY, divY) = readSidecar(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path has no $SidecarName sidecar — not a ZOrderLayout"))
    val df = spark.read.parquet(path)
    val dtX = df.schema(colX).dataType
    val dtY = df.schema(colY).dataType
    val bxLo = bucketId(divX, xLo, dtX)
    val bxHi = divX.count(d => cmp(dtX, d, xHiEx) < 0) // see RangeLayout.readWith
    val byLo = bucketId(divY, yLo, dtY)
    val byHi = divY.count(d => cmp(dtY, d, yHiEx) < 0)
    val cells = for {
      bx <- bxLo to bxHi
      by <- byLo to byHi
    } yield zValue(bx, by)
    df.filter(col("__zb").isin(cells: _*))
      .filter(col(colX) >= lit(xLo).cast(dtX) &&
        col(colX) < lit(xHiEx).cast(dtX) &&
        col(colY) >= lit(yLo).cast(dtY) &&
        col(colY) < lit(yHiEx).cast(dtY))
      .drop("__zb")
  }

  // --- sidecar I/O (same conventions as RangeLayout's) ---

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeSidecar(spark: SparkSession, path: String,
                           colX: String, divX: Seq[String],
                           colY: String, divY: Seq[String]): Unit = {
    // Self-describing: "nX" carries divX's length so the reader parses
    // POSITIONALLY — a division whose text happens to be "colY" can
    // neither shift the split point nor fail a valid layout.
    val json = s"""{"colX":${jsonStr(colX)},"nX":${jsonStr(divX.size.toString)}""" +
      s""","divX":[""" + divX.map(jsonStr).mkString(",") +
      s"""],"colY":${jsonStr(colY)},"divY":[""" +
      divY.map(jsonStr).mkString(",") + "]}"
    val p = new org.apache.hadoop.fs.Path(path, SidecarName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load (colX, divX, colY, divY) from the sidecar, if present. */
  def readSidecar(spark: SparkSession, path: String)
      : Option[(String, Seq[String], String, Seq[String])] = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString(java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      require(json.trim.endsWith("]}"),
        s"malformed $SidecarName at $path (truncated)")
      val strs = RangeLayout.parseStrings(json)
      // Fully positional layout fixed by writeSidecar:
      // "colX", <x>, "nX", <len>, "divX", d*len, "colY", <y>, "divY", d...
      require(strs.length >= 5 && strs(0) == "colX" && strs(2) == "nX" &&
        strs(4) == "divX" && strs(3).forall(_.isDigit) && strs(3).nonEmpty,
        s"malformed $SidecarName at $path")
      val nX = strs(3).toInt
      val iY = 5 + nX
      require(iY + 2 < strs.length && strs(iY) == "colY" &&
        strs(iY + 2) == "divY",
        s"malformed $SidecarName at $path (divX length mismatch)")
      Some((strs(1), strs.slice(5, iY), strs(iY + 1), strs.drop(iY + 3)))
    }
  }
}
