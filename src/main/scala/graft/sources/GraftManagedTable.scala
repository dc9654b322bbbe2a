package graft.sources

import java.util.{Set => JSet}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.{AtomicPublish, MergeInto}

/** The CATALOG-owned table: [[GraftReadOnlyTable]]'s reads (manifest
  * snapshot, zonemap/bloom segment pruning) plus a WRITE DOOR THAT
  * ROUTES THROUGH THE COMMIT PROTOCOL — the half of the SQL surface
  * the path door deliberately refuses. The path door
  * (`USING graft OPTIONS (path …)`) stays welded: a bare path is an
  * address, and a `mode("overwrite")` there would delete the manifest
  * and every retained version before any format hook runs. A name
  * resolved through the catalog's warehouse is different — the catalog
  * OWNS that layout (it already serves CREATE/DROP/RENAME), so it can
  * hand out writes that land as real protocol commits:
  *
  *   - `INSERT INTO t SELECT …`        → [[AtomicPublish.appendSegment]]
  *     (stage the batch with no lock held, manifest CAS appends it —
  *     write cost ∝ the batch, exactly the daily-ingest shape)
  *   - `INSERT OVERWRITE t SELECT …`   → [[AtomicPublish.publish]]
  *     (a NEW version over the same version log — the overwritten
  *     state stays time-travel-readable within retention; nothing is
  *     deleted at commit time)
  *   - `df.writeTo(t).overwrite(cond)` → [[MergeInto.replaceWhere]]
  *     (zone-disjoint segments stay in place — the partial-overwrite
  *     path, cost ∝ the affected range)
  *
  * All three ride the V1 write bridge ([[InsertableRelation]]): Spark
  * resolves/casts the input against the table schema, hands the driver
  * one DataFrame, and the protocol op does its own distributed write +
  * commit — the same staging-then-CAS every API write uses, so SQL
  * writers and API writers can race each other safely. (Delta's
  * DataSource took the same V1 bridge for years; a native DSv2
  * BatchWrite would re-implement parquet task files + commit
  * coordination the protocol already owns.)
  *
  * `mergeKeys` (the `merge.keys` TBLPROPERTY, persisted at CREATE) is
  * carried for the DML rule ([[graft.plans.GraftSqlDml]]): it routes
  * SQL UPDATE/DELETE/MERGE through merge-on-read (write ∝ batch) when
  * keys exist, copy-on-write partial rewrites when they don't.
  */
private[graft] class GraftManagedTable(
    inner: GraftReadOnlyTable,
    sparkSession: SparkSession,
    val tableRoot: String,
    val mergeKeys: Option[Seq[String]],
    props: Map[String, String],
    val pendingMor: Boolean)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with SupportsWrite {

  // COMPOSITION, not FileTable inheritance, deliberately: Spark's
  // FallBackFileSourceV2 analyzer rule reroutes ANY
  // `INSERT INTO <FileTable>` to the V1 file-format write path —
  // which for graft is the welded [[GraftWriteRefused]] fallback. A
  // plain Table wrapper keeps the read machinery (delegated
  // ScanBuilder = same pruning, pushdown and file-size statistics)
  // while INSERT resolves through `newWriteBuilder` like any real
  // lakehouse connector.

  override def name(): String = inner.name

  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    inner.columns()

  @deprecated("columns", "kept for Table compatibility")
  override def schema(): org.apache.spark.sql.types.StructType = inner.schema

  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()

  override def properties(): java.util.Map[String, String] = {
    val base = new java.util.HashMap[String, String](inner.properties())
    props.foreach { case (k, v) => base.put(k, v) }
    base
  }

  override def capabilities(): JSet[TableCapability] =
    JSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)

  /** A pending-merge table's RELATION is a placeholder the DML rule
    * swaps for the reconciled [[AtomicPublish.readOver]] plan at
    * analysis time; if a scan is ever BUILT on it, the rule wasn't
    * installed — refuse rather than re-materialize overridden rows
    * (the same correctness line the path door draws, one hook later
    * because the catalog legitimately loads pending tables for DML). */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    if (pendingMor) throw new IllegalStateException(
      s"graft catalog at $tableRoot: the table carries pending " +
        "merge-on-read segment(s) and this session lacks the graft DML " +
        "rule that reconciles them — add " +
        "spark.sql.extensions=graft.engine.GraftExtensions, fold the " +
        "table (MergeInto.compactMerged), or read via " +
        "AtomicPublish.read")
    // the delegating wrapper keeps every batch pushdown surface intact
    // and adds Scan.toMicroBatchStream — `readStream.table(name)`
    // tails the manifest (see GraftTableStream.scala)
    new GraftManagedScanBuilder(inner.newScanBuilder(options),
      sparkSession, tableRoot, inner.schema, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(sparkSession, tableRoot)
}

/** Write modes the SQL planner negotiates: plain append (INSERT INTO),
  * truncate (INSERT OVERWRITE — the whole table), or
  * overwrite-by-filter (`writeTo(t).overwrite(cond)` — the
  * replaceWhere partial overwrite). Spark calls `truncate()` /
  * `overwrite(filters)` on this builder BEFORE `build()`. */
private class GraftWriteBuilder(spark: SparkSession, tableRoot: String)
  extends WriteBuilder with SupportsOverwrite {

  private var mode: GraftWriteMode = GraftWriteMode.Append

  override def truncate(): WriteBuilder = { mode = GraftWriteMode.Publish; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // AlwaysTrue (INSERT OVERWRITE's canonical filter) = full publish
    mode =
      if (filters.forall(_.isInstanceOf[AlwaysTrue]))
        GraftWriteMode.Publish
      else GraftWriteMode.Replace(
        filters.map(FilterColumns.toColumn).reduce(_ && _))
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit =
          mode match {
            case GraftWriteMode.Append =>
              AtomicPublish.appendSegment(spark, tableRoot)(p =>
                data.write.parquet(p))
              ()
            case GraftWriteMode.Publish =>
              AtomicPublish.publish(spark, tableRoot)(p =>
                data.write.parquet(p))
              ()
            case GraftWriteMode.Replace(cond) =>
              MergeInto.replaceWhere(spark, tableRoot, cond, data)
              ()
          }
      }
  }
}

private sealed trait GraftWriteMode
private object GraftWriteMode {
  case object Append extends GraftWriteMode
  case object Publish extends GraftWriteMode
  final case class Replace(cond: org.apache.spark.sql.Column)
    extends GraftWriteMode
}

/** `sources.Filter` → `Column` for the overwrite-by-filter door — the
  * dual of Spark's own filter pushdown translation. Unsupported
  * shapes refuse loudly (never silently widen or narrow an OVERWRITE
  * region). */
private[sources] object FilterColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.{sources => f}

  def toColumn(filter: Filter): Column = filter match {
    case f.EqualTo(a, v)            => col(a) === lit(v)
    case f.EqualNullSafe(a, v)      => col(a) <=> lit(v)
    case f.GreaterThan(a, v)        => col(a) > lit(v)
    case f.GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case f.LessThan(a, v)           => col(a) < lit(v)
    case f.LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case f.In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case f.IsNull(a)                => col(a).isNull
    case f.IsNotNull(a)             => col(a).isNotNull
    case f.StringStartsWith(a, v)   => col(a).startsWith(v)
    case f.StringEndsWith(a, v)     => col(a).endsWith(v)
    case f.StringContains(a, v)     => col(a).contains(v)
    case f.And(l, r)                => toColumn(l) && toColumn(r)
    case f.Or(l, r)                 => toColumn(l) || toColumn(r)
    case f.Not(c)                   => not(toColumn(c))
    case f.AlwaysTrue()             => lit(true)
    case f.AlwaysFalse()            => lit(false)
    case other => throw new UnsupportedOperationException(
      s"graft overwrite-by-filter: unsupported filter shape $other — " +
        "use MergeInto.replaceWhere with an explicit Column predicate")
  }
}
