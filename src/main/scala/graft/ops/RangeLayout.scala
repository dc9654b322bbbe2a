package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted range-partitioned layout — the dask `set_index`/divisions
  * analogue (SURVEY.md §2.1 [P]): a table written as one directory per
  * index range, so a query with a tight index predicate LISTS only the
  * overlapping directories instead of scanning the table.
  *
  * Divisions are explicit sorted boundaries (exactly dask's
  * `divisions`): partition i holds divisions(i-1) <= v < divisions(i)
  * (open-ended at both extremes). Because the boundaries are plan-time
  * literals, the reader can compute the overlapping partition-id range
  * CLIENT-SIDE from the query bounds — the same arithmetic dask does —
  * and emit it as a filter on the Hive partition column, which Spark
  * applies at file-listing time (`PartitionFilters` in the scan, i.e.
  * true directory pruning, not a row filter). Rows are additionally
  * clustered per partition and sorted by the index column at write
  * time, so parquet row-group min/max statistics prune WITHIN the
  * surviving partitions too.
  *
  * Boundaries travel as ISO-formatted strings: lexicographic string
  * order equals temporal order for ISO dates/timestamps and plain
  * string keys, which keeps the driver-side interval arithmetic a
  * one-line `count(_ <= v)` with no type dispatch.
  */
object RangeLayout {

  /** Sidecar file holding the write-time divisions. Underscore-prefixed
    * so Spark's file index treats it as hidden and never feeds it to the
    * parquet reader.
    */
  val SidecarName = "_divisions.json"

  /** Write `df` under `path` partitioned into ranges of `colName` by
    * `divisions` (sorted ISO-string boundaries, cast to the column's
    * type in-plan). One cluster-by-partition shuffle, then a sorted
    * write — the pay-once layout cost `set_index` charges.
    *
    * The divisions are persisted in a `_divisions.json` sidecar next to
    * the data (dask persists divisions with the collection for the same
    * reason): a later read that guessed different boundaries would prune
    * directories that actually hold matching rows — silently wrong
    * results. With the sidecar, `read` validates or self-loads.
    */
  def write(df: DataFrame, path: String, colName: String,
            divisions: Seq[String]): Unit = {
    require(divisions == divisions.sorted, "divisions must be sorted")
    val dt = df.schema(colName).dataType
    val pid = divisions.foldLeft(lit(0)) { (acc, d) =>
      acc + when(col(colName) >= lit(d).cast(dt), 1).otherwise(0)
    }
    df.withColumn("__rp", pid)
      .repartition(col("__rp"))
      // __rp leads: partitionBy requires partition-column order, so
      // sorting it ourselves keeps Spark from injecting a sort that
      // would not preserve the per-directory index clustering.
      .sortWithinPartitions(col("__rp"), col(colName))
      .write.mode("overwrite").partitionBy("__rp").parquet(path)
    writeSidecar(df.sparkSession, path, colName, divisions)
  }

  /** Partition id covering value `v` under `divisions` (ISO-string order). */
  def partitionId(divisions: Seq[String], v: String): Int =
    divisions.count(_ <= v)

  /** Rows with lower <= colName < upperExclusive, listing ONLY the
    * partition directories whose division range intersects the bounds.
    * Column and divisions come from the layout's own sidecar — the
    * caller cannot desync from the write-time boundaries.
    */
  def read(spark: SparkSession, path: String, lower: String,
           upperExclusive: String): DataFrame = {
    val (colName, divisions) = readSidecar(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path has no $SidecarName sidecar — not a RangeLayout " +
          "(or written before divisions were persisted); use the " +
          "explicit-divisions read overload only for legacy layouts"))
    readWith(spark, path, colName, divisions, lower, upperExclusive)
  }

  /** Explicit-divisions read. If the layout carries a sidecar, the
    * caller's column/divisions MUST match it exactly — a mismatch
    * throws instead of silently pruning matching rows. Only a legacy
    * layout with no sidecar trusts the caller.
    */
  def read(spark: SparkSession, path: String, colName: String,
           divisions: Seq[String], lower: String,
           upperExclusive: String): DataFrame = {
    readSidecar(spark, path).foreach { case (c, d) =>
      if (c != colName || d != divisions)
        throw new IllegalArgumentException(
          s"divisions mismatch for $path: caller gave column=$colName " +
            s"divisions=${divisions.mkString("[", ",", "]")} but the " +
            s"layout was written with column=$c " +
            s"divisions=${d.mkString("[", ",", "]")} — pruning with the " +
            "caller's boundaries would silently drop matching rows")
    }
    readWith(spark, path, colName, divisions, lower, upperExclusive)
  }

  private def readWith(spark: SparkSession, path: String, colName: String,
                       divisions: Seq[String], lower: String,
                       upperExclusive: String): DataFrame = {
    val lo = partitionId(divisions, lower)
    // values strictly below `upper` can reach at most the partition
    // holding upper's immediate predecessor: count of divisions < upper.
    val hi = divisions.count(_ < upperExclusive)
    val df = spark.read.parquet(path)
    val dt = df.schema(colName).dataType
    df.filter(col("__rp").between(lo, hi))
      .filter(col(colName) >= lit(lower).cast(dt) &&
        col(colName) < lit(upperExclusive).cast(dt))
      .drop("__rp")
  }

  // --- sidecar I/O (Hadoop FS so HDFS/S3 layouts work, not just file://) ---

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeSidecar(spark: SparkSession, path: String,
                           colName: String, divisions: Seq[String]): Unit = {
    val json = s"""{"column":${jsonStr(colName)},"divisions":[""" +
      divisions.map(jsonStr).mkString(",") + "]}"
    val p = new org.apache.hadoop.fs.Path(path, SidecarName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load (column, divisions) from the sidecar, if present. */
  def readSidecar(spark: SparkSession,
                  path: String): Option[(String, Seq[String])] = {
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
      // A partially-written sidecar truncated after a complete literal
      // would still parse its prefix; the trailing "]}"-check rejects ANY
      // truncation, including one that only drops the last division.
      require(json.trim.endsWith("]}"),
        s"malformed $SidecarName at $path (truncated)")
      val strs = parseStrings(json)
      // Literal order is fixed by writeSidecar: "column", <col>,
      // "divisions", <d0>, <d1>, ... — positional, so a column literally
      // named "divisions" cannot confuse the key scan.
      require(strs.length >= 3 && strs(0) == "column" && strs(2) == "divisions",
        s"malformed $SidecarName at $path")
      Some((strs(1), strs.drop(3)))
    }
  }

  /** All JSON string literals in `json`, in order, unescaped.
    * Shared with [[ZOrderLayout]]'s sidecar reader.
    */
  private[ops] def parseStrings(json: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < json.length) {
      if (json(i) == '"') {
        val sb = new StringBuilder
        i += 1
        // Bounds-checked: a truncated/corrupt sidecar with an unterminated
        // string must fall through to the caller's malformed-sidecar
        // require (by yielding no closing literal), not throw
        // StringIndexOutOfBoundsException here.
        var closed = false
        while (!closed && i < json.length) {
          if (json(i) == '"') closed = true
          else if (json(i) == '\\' && i + 1 < json.length) {
            i += 1
            json(i) match {
              case 'u' if i + 5 <= json.length =>
                sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar
                i += 4
              case 'u' => i = json.length // truncated \u escape: abort literal
              case 'n' => sb += '\n'
              case 't' => sb += '\t'
              case 'r' => sb += '\r'
              case c => sb += c
            }
          } else sb += json(i)
          i += 1
        }
        if (closed) out += sb.result()
        i -= 1 // outer loop re-advances past the closing quote
      }
      i += 1
    }
    out.result()
  }
}
