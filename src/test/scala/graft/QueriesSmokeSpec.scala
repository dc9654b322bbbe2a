package graft

import graft.queries.Registry

/** Every registered query must build and execute on sf0.001. Queries
  * designed to be non-empty are checked for rows; schema must have
  * stable column names (the oracle contract sorts by name).
  */
class QueriesSmokeSpec extends SparkSpec {

  // Queries that may legitimately return 0 rows at tiny scale.
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "embed_neardup", "join_anti")

  Registry.all.foreach { q =>
    test(s"query ${q.key} runs on sf0.001") {
      val df = q.build(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.key)) assert(n > 0, s"${q.key} returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"${q.key} has duplicate column names")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
