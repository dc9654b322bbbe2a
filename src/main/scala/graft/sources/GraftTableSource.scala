package graft.sources

import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.AtomicPublish

/** DataSource V2 front door for [[graft.ops.AtomicPublish]] tables —
  * `spark.read.format("graft").load(tableRoot)` and SQL text
  * `CREATE TEMPORARY VIEW v USING graft OPTIONS (path '…')` resolve
  * the MANIFEST and scan exactly the committed version's segment
  * directories. This upgrades the round-14 `registerView` temp-view
  * shim into a first-class source: schema inference, column pruning,
  * filter pushdown, partitioned reads — all inherited from the
  * built-in parquet DSv2 implementation; the ONLY graft-specific step
  * is path resolution (manifest → versioned `data-*` dirs), which is
  * exactly the protocol's reader contract ([[AtomicPublish.read]]).
  *
  * Snapshot semantics: the manifest is resolved when the relation's
  * paths are computed (plan creation), so a query binds one committed
  * version in full — never a torn mix — and under the retention-window
  * GC its files outlive any later commits for the configured window.
  * Re-create the view / re-issue the read to advance.
  *
  * READ door only, ENFORCED: writes must go through [[AtomicPublish]]
  * (publish / appendSegment / compactSegments), which is what provides
  * atomicity, the cross-process commit lock, and GC. A
  * `df.write.format("graft").mode("overwrite").save(tableRoot)` would
  * otherwise delete the MANIFEST and every committed version before
  * landing unmanifested files — so the table this source serves
  * REFUSES write builders at PLAN time (before any destructive step),
  * naming the real write door. Kind-structured INDEX tables
  * (semantic/ivf: `assign/` + `model/` inside each segment) are
  * exposed through [[graft.ops.DedupIndex.registerIndexViews]]
  * instead — their segments are not flat parquet directories.
  */
class GraftTableSource extends ParquetDataSourceV2 {

  override def shortName(): String = "graft"

  // V1-fallback resolution (DataFrameWriter.save routes EVERY file
  // source's write through V1; streaming sources resolve the same way)
  // instantiates this class BEFORE building the write command — and
  // overwrite mode deletes existing data before any format METHOD runs,
  // so the constructor is the only hook early enough to refuse without
  // collateral damage. Batch V2 reads never instantiate the fallback.
  override def fallbackFileFormat
      : Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat] =
    classOf[GraftWriteRefused]

  override def getPaths(map: CaseInsensitiveStringMap): Seq[String] = {
    val roots = super.getPaths(map)
    require(roots.nonEmpty,
      "graft source needs a table root: .load(path) or OPTIONS (path '…')")
    roots.flatMap { root =>
      val segs = AtomicPublish.currentSegments(sparkSession, root)
      if (segs.isEmpty) throw new IllegalStateException(
        s"no published version (MANIFEST) at $root — the graft format reads " +
          "AtomicPublish tables; for plain parquet directories use " +
          "format(\"parquet\")")
      segs.map(d => s"$root/$d")
    }
  }

  override def getTable(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftReadOnlyTable(tableName, sparkSession, optionsWithoutPaths,
      paths, None, fallbackFileFormat)
  }

  override def getTable(options: CaseInsensitiveStringMap,
                        schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftReadOnlyTable(tableName, sparkSession, optionsWithoutPaths,
      paths, Some(schema), fallbackFileFormat)
  }
}

/** The V1 fallback that refuses at INSTANTIATION — see
  * [[GraftTableSource.fallbackFileFormat]]: by the time any FileFormat
  * method runs, overwrite mode has already deleted the table root. */
class GraftWriteRefused
  extends org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat {
  throw new UnsupportedOperationException(
    "the graft format is the READ door for published tables; writing (or " +
      "V1-resolving) through it would bypass the manifest commit protocol " +
      "(atomic swap, cross-process lock, retention GC) — write via " +
      "graft.ops.AtomicPublish (publish / appendSegment) or " +
      "MergeInto.upsertInto")
}

/** The parquet DSv2 table with the write door welded shut: refusing in
  * `newWriteBuilder` covers the catalog V2 write routes (the V1
  * DataFrameWriter route is refused even earlier, at fallback
  * instantiation — see [[GraftWriteRefused]]). */
private class GraftReadOnlyTable(
    name: String,
    sparkSession: org.apache.spark.sql.SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String],
    userSpecifiedSchema: Option[org.apache.spark.sql.types.StructType],
    fallbackFileFormat: Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat])
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
    name, sparkSession, options, paths, userSpecifiedSchema, fallbackFileFormat) {

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    throw new UnsupportedOperationException(
      "the graft format is the READ door for published tables; writing " +
        "through it would bypass the manifest commit protocol (atomic swap, " +
        "cross-process lock, retention GC) — write via graft.ops.AtomicPublish " +
        "(publish / appendSegment) or MergeInto.upsertInto")
}
