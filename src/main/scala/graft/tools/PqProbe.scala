package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ-vs-brute scale evidence: the claim is that ADC over 16-byte
  * codes beats streaming 512 B full vectors as the corpus grows, at a
  * recall the gate already pins. Per scale point: fit (seeded, sampled
  * — the pay-once term), encode+shortlist+re-rank wall vs the exact
  * bruteTopK wall for the same 20 queries, and the measured recall of
  * the final top-10 against brute's. Run across sf0.1 → ×100
  * embeddings (5k → 500k vectors).
  *
  * Usage: graft.tools.PqProbe [sfDir]
  */
object PqProbe {

  private def stealJiffies(): Long =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](f: => A): (Double, Long, A) = {
      val j0 = stealJiffies(); val s = System.nanoTime(); val a = f
      ((System.nanoTime() - s) / 1e9,
        if (j0 < 0) -1L else stealJiffies() - j0, a)
    }
    val emb = graft.engine.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val n = graft.ops.AnnSearch.parquetRowCount(spark,
      s"$dir/embeddings.parquet")
    val (fitSec, fitSteal, model) = t(
      graft.ops.PqSearch.fit(spark, emb, "vec_id", "e"))
    // INGEST side, paid once per corpus: encode + persist the codes
    // (the deployment stores m ints/row next to — or instead of — the
    // full vectors on the search path)
    val codesPath = graft.engine.Scratch.dir("pq_codes") + s"-${n}"
    val (encodeSec, encodeSteal, _) = t {
      graft.ops.PqSearch.encode(
        emb.select($"vec_id".as("id"), $"e"), "e", model)
        .select($"id", $"codes")
        .write.mode("overwrite").parquet(codesPath)
    }
    val (bruteSec, bruteSteal, bruteRows) = t(
      graft.ops.AnnSearch.bruteTopK(spark, emb, "vec_id", "e",
        $"id" < 20, k = 10).collect())
    // QUERY side, paid per search: ADC over the persisted codes +
    // exact re-rank of shortlist-many full vectors
    val coded = spark.read.parquet(codesPath)
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"e".as("qe"))
    val vecs = emb.select($"vec_id".as("id"), $"e")
    val (pqSec, pqSteal, pqRows) = t {
      val short = graft.ops.PqSearch.pqShortlistCoded(spark, coded,
        queries, model, shortlist = 100).select($"q_id", $"id")
      import org.apache.spark.sql.expressions.Window
      val exact = short.join(vecs, "id").join(broadcast(queries), "q_id")
        .withColumn("sim", graft.engine.GraftFunctions.cosineSim(
          spark, $"qe", $"e"))
      val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"id")
      exact.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 10)
        .select($"q_id", $"rank", $"id".as("neighbor_id")).collect()
    }
    val truth = bruteRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val hit = pqRows.count(r => truth((r.getLong(0), r.getLong(2))))
    // the scan-side BYTES are the 100 TB argument: brute streams the
    // full vectors per search; PQ streams the codes (+ shortlist-many
    // vectors in the re-rank) — page-cached local parquet hides this
    // from the walls, a cluster's storage tier does not
    def bytesOf(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(hp).getLength
    }
    val vecBytes = bytesOf(s"$dir/embeddings.parquet")
    val codeBytes = bytesOf(codesPath)
    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"sf":"$dir","n":$n,"fit":${j(fitSec)},"fit_steal":$fitSteal,""" +
      s""""encode_persist":${j(encodeSec)},"encode_steal":$encodeSteal,""" +
      s""""brute":${j(bruteSec)},"brute_steal":$bruteSteal,""" +
      s""""pq_query":${j(pqSec)},"pq_query_steal":$pqSteal,""" +
      s""""vector_bytes":$vecBytes,"code_bytes":$codeBytes,""" +
      s""""topk_recall":${j(hit.toDouble / truth.size)}}""")
    spark.stop()
  }
}
