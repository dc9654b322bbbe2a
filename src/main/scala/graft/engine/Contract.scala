package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Post-load schema contract for the driver-generated testdata.
  *
  * The generator has drifted across regenerations (events.ts has shipped
  * as ns-as-long, µs-NTZ and µs-LTZ), and a silent dtype change breaks
  * whole query families at runtime instead of at the boundary. This
  * contract pins what every graded query may assume AFTER `Tables`
  * loads a table:
  *
  *   - `events.ts` is strictly `TimestampType` — `Tables.normalizeTs`
  *     guarantees it regardless of the physical parquet encoding.
  *   - `o_orderdate` / `l_shipdate` admit either wall-clock timestamp
  *     flavor (LTZ or NTZ): under the pinned UTC session timezone both
  *     compare identically against date literals and both are
  *     oracle-hash-safe (proven by the round-8 board passing on NTZ
  *     data). Anything else (raw long, date32, string) fails loudly.
  *   - Everything else is pinned exactly.
  *
  * EngineContractSpec runs this at suite start; Verify prints (but does
  * not abort on) violations so a drifted regeneration still grades the
  * keys it can while naming the drift in the driver log.
  */
object Contract {
  private def is(d: DataType): DataType => Boolean = _ == d
  private val tsStrict: DataType => Boolean = _ == TimestampType
  private val tsAny: DataType => Boolean =
    dt => dt == TimestampType || dt == TimestampNTZType

  private type Col = (String, DataType => Boolean, String)

  private val expected: Seq[(String, Seq[Col])] = Seq(
    "region" -> Seq(
      ("r_regionkey", is(IntegerType), "int"),
      ("r_name", is(StringType), "string")),
    "nation" -> Seq(
      ("n_nationkey", is(IntegerType), "int"),
      ("n_name", is(StringType), "string"),
      ("n_regionkey", is(IntegerType), "int")),
    "customer" -> Seq(
      ("c_custkey", is(LongType), "bigint"),
      ("c_name", is(StringType), "string"),
      ("c_nationkey", is(IntegerType), "int"),
      ("c_acctbal", is(DoubleType), "double"),
      ("c_mktsegment", is(StringType), "string")),
    "supplier" -> Seq(
      ("s_suppkey", is(LongType), "bigint"),
      ("s_name", is(StringType), "string"),
      ("s_nationkey", is(IntegerType), "int"),
      ("s_acctbal", is(DoubleType), "double")),
    "part" -> Seq(
      ("p_partkey", is(LongType), "bigint"),
      ("p_name", is(StringType), "string"),
      ("p_brand", is(StringType), "string"),
      ("p_type", is(StringType), "string"),
      ("p_size", is(IntegerType), "int"),
      ("p_retailprice", is(DoubleType), "double")),
    "orders" -> Seq(
      ("o_orderkey", is(LongType), "bigint"),
      ("o_custkey", is(LongType), "bigint"),
      ("o_orderstatus", is(StringType), "string"),
      ("o_totalprice", is(DoubleType), "double"),
      ("o_orderdate", tsAny, "timestamp|timestamp_ntz"),
      ("o_orderpriority", is(StringType), "string")),
    "lineitem" -> Seq(
      ("l_orderkey", is(LongType), "bigint"),
      ("l_partkey", is(LongType), "bigint"),
      ("l_suppkey", is(LongType), "bigint"),
      ("l_linenumber", is(IntegerType), "int"),
      ("l_quantity", is(DoubleType), "double"),
      ("l_extendedprice", is(DoubleType), "double"),
      ("l_discount", is(DoubleType), "double"),
      ("l_tax", is(DoubleType), "double"),
      ("l_returnflag", is(StringType), "string"),
      ("l_linestatus", is(StringType), "string"),
      ("l_shipdate", tsAny, "timestamp|timestamp_ntz")),
    "events" -> Seq(
      ("event_id", is(LongType), "bigint"),
      ("ts", tsStrict, "timestamp (normalized by Tables.normalizeTs)"),
      ("user_id", is(LongType), "bigint"),
      ("event_type", is(StringType), "string"),
      ("value", is(DoubleType), "double"),
      ("props", is(StringType), "string")),
    "documents" -> Seq(
      ("doc_id", is(LongType), "bigint"),
      ("text", is(StringType), "string"),
      ("lang", is(StringType), "string"),
      ("source", is(StringType), "string"),
      ("n_chars", is(LongType), "bigint")),
    "embeddings" -> Seq(
      ("vec_id", is(LongType), "bigint"),
      ("embedding", is(ArrayType(FloatType, containsNull = true)), "array<float>"),
      ("label", is(IntegerType), "int")),
  )

  /** Returns one human-readable line per drifted/missing column; empty
    * means the testdata matches the pinned contract. */
  def violations(spark: SparkSession, dir: String): Seq[String] =
    expected.flatMap { case (table, cols) =>
      try {
        val schema = Tables(spark, dir, table).schema
        cols.flatMap { case (name, ok, want) =>
          schema.fields.find(_.name == name) match {
            case None =>
              Some(s"$table.$name: MISSING (want $want)")
            case Some(f) if !ok(f.dataType) =>
              Some(s"$table.$name: got ${f.dataType.simpleString}, want $want")
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"$table: unreadable (${e.getMessage})")
      }
    }

  /** FILE-LAYOUT contract for the tables whose PLANNING reads parquet
    * footers driver-side (`AnnSearch.parquetRowCount` feeds bloom, ANN
    * and Hamming provisioning): the table path must be a flat file or
    * directory of part files — a partitioned regeneration (nested
    * `col=value/` subdirectories) would make the non-recursive footer
    * walk silently count 0 and mis-provision every adaptive plan long
    * before any key visibly failed — and the summed footer record
    * counts must equal the engine's own count of the same path. */
  def layoutViolations(spark: SparkSession, dir: String): Seq[String] =
    Seq("orders", "documents", "embeddings").flatMap { t =>
      val path = s"$dir/$t.parquet"
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val st = fs.getFileStatus(p)
        val nested =
          if (st.isDirectory)
            fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
          else Seq.empty
        val footers = graft.ops.AnnSearch.parquetRowCount(spark, path)
        val actual = spark.read.parquet(path).count()
        (if (nested.nonEmpty)
           Seq(s"$t: nested directories ${nested.mkString(",")} — footer " +
             "walk is non-recursive, planning would see 0 rows")
         else Nil) ++
        (if (footers <= 0 || footers != actual)
           Seq(s"$t: footer row count $footers != scan count $actual")
         else Nil)
      } catch {
        case e: Throwable => Seq(s"$t: unreadable layout (${e.getMessage})")
      }
    }

  /** Hard gate (used by EngineContractSpec): throws naming every drifted
    * column so a testdata regeneration turns into ONE red assertion
    * instead of N silently-broken keys. */
  def assertAll(spark: SparkSession, dir: String): Unit = {
    val v = violations(spark, dir) ++ layoutViolations(spark, dir)
    require(v.isEmpty,
      s"TESTDATA CONTRACT VIOLATION ($dir) — generator drift?\n  " +
        v.mkString("\n  "))
  }
}
