package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: the Spark-side plan builder plus (where the
  * semantics are deterministic SQL) the DuckDB oracle the driver
  * hash-compares against. Queries without an oracle (engine-specific
  * RNG, approximate sketches) are gated by ScalaTest properties
  * instead and get the driver's weaker rows-only check.
  *
  * Contract (SURVEY.md §7): every oracle query ends in a total ORDER BY
  * with key tie-breakers, aliases every computed column identically on
  * both sides, and never aggregates raw doubles (see [[graft.engine.Det]]).
  */
final case class GQuery(
    key: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  def queries: Seq[GQuery]
}

object Registry {
  def groups: Seq[QueryGroup] = Seq(
    SourceQueries,
    RelationalQueries,
    JoinQueries,
    AggQueries,
    WindowQueries,
    SetQueries,
    FunctionQueries,
    StreamingQueries,
    PandasQueries,
    LlmQueries)

  lazy val all: Seq[GQuery] = {
    val qs = groups.flatMap(_.queries)
    val dup = qs.groupBy(_.key).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate query keys: $dup")
    qs
  }

  lazy val byKey: Map[String, GQuery] = all.map(q => q.key -> q).toMap
}
