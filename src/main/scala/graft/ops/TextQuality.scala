package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style text-quality statistics (SURVEY §2.9), shared by the
  * graded `quality_score` / `quality_filter` queries and the empty-doc
  * hardening spec. All per-token ratios are 0-guarded: n_tokens = 0
  * (pre-tokenized empty input — note `split("")` itself yields `[""]`,
  * size 1, so the regime arrives via token ARRAYS, not raw strings)
  * must produce finite stats, never NaN/Infinity — an empty doc has to
  * gate out of a corpus deterministically on every engine, and a NaN
  * is a hash mismatch against any SQL oracle.
  */
object TextQuality {

  /** Appends n_tokens, stop_hits, stop_ratio, short_ratio, score. */
  def withScore(df: DataFrame, toks: Column, stop: Seq[String]): DataFrame = {
    def ratio(num: Column): Column =
      when(col("n_tokens") === 0, lit(0.0)).otherwise(num / col("n_tokens"))
    df.withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => t.isin(stop.map(lit(_)): _*))))
      .withColumn("stop_ratio", ratio(col("stop_hits")))
      .withColumn("short_ratio",
        ratio(size(filter(col("toks"), t => length(t) <= 2))))
      .withColumn("score",
        lit(1.0) - col("short_ratio") * 0.5 - col("stop_ratio") * 0.25)
  }

  /** Appends n_tokens, avg_word_len, short_frac, passes (the composite
    * Gopher gate). `nChars` is the raw character count of the document.
    */
  def withGate(df: DataFrame, toks: Column, nChars: Column): DataFrame =
    df.withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("avg_word_len", when(col("n_tokens") === 0, lit(0.0))
        .otherwise((nChars - (col("n_tokens") - 1)).cast("double") / col("n_tokens")))
      .withColumn("short_frac", when(col("n_tokens") === 0, lit(0.0))
        .otherwise(size(filter(col("toks"), t => length(t) <= 2)).cast("long")
          / col("n_tokens")))
      .withColumn("passes",
        col("n_tokens").between(10L, 5000L)
          && col("avg_word_len").between(2.0, 12.0)
          && col("short_frac") < 0.4)
}
