package graft.engine

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import graft.functions.{BottomKSample, CosineSimilarity, HyperplaneBuckets, MinHashBands, MinHashSignature, NGramHashes, PqAdcDistance, PqEncode, RollingHashFingerprint, SimHash64, TokenRepetitionStats}

/** Registration of graft's native Catalyst expressions as SQL functions.
  *
  * Two paths: [[GraftExtensions]] for `spark.sql.extensions` (the
  * idiomatic injection point), and [[GraftFunctions.ensureRegistered]]
  * for sessions we didn't build (registers into the session's
  * FunctionRegistry at first use — idempotent).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", es => CosineSimilarity(es(0), es(1))),
    ("pq_adc", es => PqAdcDistance(es(0), es(1))),
    ("pq_encode", es => PqEncode(es(0), es(1))),
    ("doc_fingerprint", es => RollingHashFingerprint(es(0))),
    ("simhash64", es => SimHash64(es(0))),
    ("ngram_hashes", es => NGramHashes(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    ("token_repetition_stats", es => TokenRepetitionStats(es(0))),
    ("minhash_signature", es => MinHashSignature(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    ("minhash_bands", es => MinHashBands(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    ("bottomk_sample", es => BottomKSample(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].longValue()).toAggregateExpression()),
    ("hyperplane_buckets", es => HyperplaneBuckets(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue(),
      es(3).eval().asInstanceOf[Number].intValue(),
      es(4).eval().asInstanceOf[Number].longValue())))

  /** Extension-path registration: inject the full table (used by
    * [[GraftExtensions]]; one source of truth with [[ensureRegistered]]). */
  def injectAll(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id,
          new ExpressionInfo("graft.functions", name), builder)
      }
    }
  }

  // Column-level helpers (register on demand, then call by name so the
  // same code path works through both the classic and SQL front doors).
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark); call_function("cosine_sim", a, b)
  }
  def pqAdc(spark: SparkSession, codes: Column, luts: Column): Column = {
    ensureRegistered(spark); call_function("pq_adc", codes, luts)
  }
  def pqEncode(spark: SparkSession, vec: Column, books: Column): Column = {
    ensureRegistered(spark); call_function("pq_encode", vec, books)
  }
  def docFingerprint(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("doc_fingerprint", c)
  }
  def simhash64(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("simhash64", c)
  }
  /** Exact per-document token repetition stats (n_tokens, n_distinct,
    * top_cnt) — see [[graft.functions.TokenRepetitionStats]]. */
  def tokenRepetitionStats(spark: SparkSession, tokens: Column): Column = {
    ensureRegistered(spark); call_function("token_repetition_stats", tokens)
  }
  /** Sorted DISTINCT xxhash64-based hashes of all word n-grams of a
    * token array — see [[graft.functions.NGramHashes]]. */
  def ngramHashes(spark: SparkSession, tokens: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("ngram_hashes", tokens, org.apache.spark.sql.functions.lit(n))
  }
  /** One-pass codegen MinHash signature (NULL below two tokens) — see
    * [[graft.functions.MinHashSignature]]. */
  def minhashSignature(spark: SparkSession, text: Column, numHashes: Int): Column = {
    ensureRegistered(spark)
    call_function("minhash_signature", text, org.apache.spark.sql.functions.lit(numHashes))
  }
  /** One-pass codegen LSH band hashes of a MinHash signature — see
    * [[graft.functions.MinHashBands]]. */
  def minhashBands(spark: SparkSession, sig: Column, bands: Int): Column = {
    ensureRegistered(spark)
    call_function("minhash_bands", sig, org.apache.spark.sql.functions.lit(bands))
  }
  /** All LSH bucket ids of an embedding in one codegen'd pass — see
    * [[graft.functions.HyperplaneBuckets]]. */
  def hyperplaneBuckets(spark: SparkSession, e: Column, tables: Int, bits: Int,
                        dim: Int, seed: Long): Column = {
    ensureRegistered(spark)
    import org.apache.spark.sql.functions.lit
    call_function("hyperplane_buckets", e, lit(tables), lit(bits), lit(dim), lit(seed))
  }
  /** Deterministic distributed k-sample (bottom-k hash sketch) of a
    * bigint column — see [[graft.functions.BottomKSample]]. */
  def bottomkSample(spark: SparkSession, c: Column, k: Int, salt: Long): Column = {
    ensureRegistered(spark)
    call_function("bottomk_sample", c,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(salt))
  }
}

/** `spark.sql.extensions=graft.engine.GraftExtensions` injection —
  * the SAME function table as [[GraftFunctions.ensureRegistered]]
  * (shared, so the two front doors can never drift): a session built
  * with the extension gets every native expression by SQL name, plus
  * the SQL DML rule ([[graft.plans.GraftDmlRule]]) that turns
  * resolved UPDATE/DELETE/MERGE INTO plans over catalog-managed graft
  * tables into protocol commands (merge-on-read when the table
  * declares `merge.keys`, zone-pruned copy-on-write otherwise). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injectAll(ext)
    ext.injectResolutionRule(session => graft.plans.GraftDmlRule(session))
    // the SQL utility verbs (VACUUM / OPTIMIZE / RESTORE / DESCRIBE
    // HISTORY — none of them Spark grammar) and the CDF table-valued
    // function, Delta's own parser-extension pattern
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.plans", "table_changes"),
      graft.plans.GraftSqlParser.tableChangesPlan))
  }
}
