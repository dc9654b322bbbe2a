package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Within each surviving cell rows are sorted by (x, y), so parquet
  * row-group min/max statistics prune a second time below the
  * directory level.
  *
  * Divisions travel as strings (sidecar `_zorder.json`); values that
  * parse as numbers compare numerically, everything else compares
  * lexicographically (ISO dates/timestamps sort correctly as text —
  * same convention as RangeLayout).
  */
object ZOrderLayout {

  val SidecarName = "_zorder.json"

  /** Max buckets per dimension (8 bits each → z fits in 16 bits). */
  val MaxBuckets = 256

  /** Bucket id of `v` under `divisions` — in-plan version. */
  private def bucketCol(c: Column, divisions: Seq[String],
                        dt: org.apache.spark.sql.types.DataType): Column =
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

  /** Numeric-if-possible comparison (divisions and query bounds). */
  private def leq(a: String, b: String): Boolean =
    (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) => x <= y
      case _ => a <= b
    }
  private def lt(a: String, b: String): Boolean =
    (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) => x < y
      case _ => a < b
    }

  /** Bucket id of value `v` under `divisions` — driver-side. */
  def bucketId(divisions: Seq[String], v: String): Int =
    divisions.count(d => leq(d, v))

  /** Write `df` under `path` Z-clustered on (`colX`, `colY`).
    * One cluster-by-cell shuffle + a per-cell (x,y) sort — the same
    * pay-once layout cost as `set_index`/OPTIMIZE ZORDER.
    */
  def write(df: DataFrame, path: String, colX: String, divX: Seq[String],
            colY: String, divY: Seq[String]): Unit = {
    require(divX == divX.sortWith(lt) && divY == divY.sortWith(lt),
      "divisions must be sorted")
    require(divX.size < MaxBuckets && divY.size < MaxBuckets,
      s"at most ${MaxBuckets - 1} divisions per dimension (8-bit bucket ids)")
    val dtX = df.schema(colX).dataType
    val dtY = df.schema(colY).dataType
    val z = zCol(bucketCol(col(colX), divX, dtX),
      bucketCol(col(colY), divY, dtY))
    df.withColumn("__zb", z)
      .repartition(col("__zb"))
      .sortWithinPartitions(colX, colY)
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
    val bxLo = bucketId(divX, xLo)
    val bxHi = divX.count(d => lt(d, xHiEx)) // see RangeLayout.readWith
    val byLo = bucketId(divY, yLo)
    val byHi = divY.count(d => lt(d, yHiEx))
    val cells = for {
      bx <- bxLo to bxHi
      by <- byLo to byHi
    } yield zValue(bx, by)
    val df = spark.read.parquet(path)
    val dtX = df.schema(colX).dataType
    val dtY = df.schema(colY).dataType
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
    val json = s"""{"colX":${jsonStr(colX)},"divX":[""" +
      divX.map(jsonStr).mkString(",") +
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
      // Positional layout fixed by writeSidecar:
      // "colX", <x>, "divX", d..., "colY", <y>, "divY", d...
      val iY = strs.indexOf("colY")
      require(strs.length >= 6 && strs(0) == "colX" && strs(2) == "divX" &&
        iY >= 3 && iY + 2 < strs.length && strs(iY + 2) == "divY",
        s"malformed $SidecarName at $path")
      Some((strs(1), strs.slice(3, iY), strs(iY + 1), strs.drop(iY + 3)))
    }
  }
}
