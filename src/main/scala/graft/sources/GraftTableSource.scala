package graft.sources

import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.{AtomicPublish, ZoneMaps}

/** DataSource V2 front door for [[graft.ops.AtomicPublish]] tables —
  * `spark.read.format("graft").load(tableRoot)` and SQL text
  * `CREATE TEMPORARY VIEW v USING graft OPTIONS (path '…')` resolve
  * the MANIFEST and scan exactly the committed version's segment
  * directories. This upgrades the round-14 `registerView` temp-view
  * shim into a first-class source: schema inference, column pruning,
  * filter pushdown, partitioned reads — all inherited from the
  * built-in parquet DSv2 implementation; the graft-specific steps are
  * path resolution (manifest → versioned `data-*` dirs — exactly the
  * protocol's reader contract, [[AtomicPublish.read]]) and, round 15,
  * SEGMENT PRUNING: the scan consults each segment's zonemap sidecar
  * ([[ZoneMaps]], stamped at commit from parquet footers) and drops
  * whole segments whose min/max ranges cannot satisfy the query's
  * pushed data filters — the manifest-level analogue of parquet
  * row-group skipping, so a date predicate over a 10k-segment
  * daily-append table schedules tasks for the handful of segments the
  * range admits, not the corpus.
  *
  * Snapshot semantics: the manifest is resolved when the relation's
  * paths are computed (plan creation), so a query binds one committed
  * version in full — never a torn mix — and under the retention-window
  * GC its files outlive any later commits for the configured window.
  * Re-create the view / re-issue the read to advance. TIME TRAVEL:
  * `OPTIONS (versionAsOf 'N')` resolves version N from the commit log
  * instead ([[AtomicPublish.segmentsAt]]), valid within the retention
  * window.
  *
  * MERGE-ON-READ REFUSAL: a table carrying pending upsert segments
  * ([[graft.ops.MergeInto.upsertInto]]) needs per-key reconciliation —
  * a join — which a path-listing source cannot express; reading its
  * paths raw would re-materialize overridden rows. Such tables are
  * REFUSED loudly here: fold first (MergeInto.compactMerged) or bind
  * the reconciled plan via [[AtomicPublish.registerView]]. (The same
  * boundary Delta draws for path-based readers of tables with deletion
  * vectors.)
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

  private def resolveSegments(root: String,
                              map: CaseInsensitiveStringMap): Seq[String] = {
    val versionAsOf = Option(map.get("versionAsOf")).map { raw =>
      raw.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft source: versionAsOf must be a commit version number, got `$raw`"))
    }
    // timestampAsOf: epoch millis or ISO-8601 instant/date-time,
    // resolved through the version log's commit clock (versionAt)
    val timestampAsOf = Option(map.get("timestampAsOf")).map(raw =>
      AtomicPublish.parseInstantMs(raw, "graft source: timestampAsOf"))
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "graft source: versionAsOf and timestampAsOf are mutually exclusive")
    val segs = (versionAsOf, timestampAsOf) match {
      case (Some(v), _) => AtomicPublish.segmentsAt(sparkSession, root, v)
      case (_, Some(ts)) => AtomicPublish.segmentsAt(sparkSession, root,
        AtomicPublish.versionAt(sparkSession, root, ts))
      case _ => AtomicPublish.currentSegments(sparkSession, root)
    }
    if (segs.isEmpty) throw new IllegalStateException(
      s"no published version (MANIFEST) at $root — the graft format reads " +
        "AtomicPublish tables; for plain parquet directories use " +
        "format(\"parquet\")")
    val pending = AtomicPublish.upsertSidecarsFor(sparkSession, root, segs)
    if (pending.nonEmpty) throw new IllegalStateException(
      s"graft source at $root: the table carries ${pending.size} pending " +
        "merge-on-read segment(s) (upsert or delete tombstone) — a " +
        "path-based scan cannot apply key reconciliation and would " +
        "re-materialize overridden or deleted rows. Fold the table first " +
        "(graft.ops.MergeInto.compactMerged) or query the reconciled view " +
        "(graft.ops.AtomicPublish.registerView)")
    segs
  }

  override def getPaths(map: CaseInsensitiveStringMap): Seq[String] = {
    val roots = super.getPaths(map)
    require(roots.nonEmpty,
      "graft source needs a table root: .load(path) or OPTIONS (path '…')")
    roots.flatMap(root => resolveSegments(root, map).map(d => s"$root/$d"))
  }

  /** Zonemap sidecars for every resolved segment, keyed by segment dir
    * name — loaded once at table construction (driver-side, one small
    * JSON per segment), consulted per scan in
    * [[GraftZonePruningFileIndex]]. */
  private def loadZones(map: CaseInsensitiveStringMap)
      : Map[String, Map[String, ZoneMaps.ColZone]] = {
    val roots = super.getPaths(map)
    roots.flatMap { root =>
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val fs = rootPath.getFileSystem(
        sparkSession.sparkContext.hadoopConfiguration)
      resolveSegments(root, map).flatMap { d =>
        val z = ZoneMaps.read(fs, rootPath, d)
        if (z.isEmpty) None else Some(d -> z)
      }
    }.toMap
  }

  /** Bloom sidecars (point-lookup pruning, [[graft.ops.BloomMaps]]) for
    * every resolved segment — same lifecycle as the zonemaps. */
  private def loadBlooms(map: CaseInsensitiveStringMap)
      : Map[String, Map[String, graft.ops.BloomMaps.ColBloom]] = {
    val roots = super.getPaths(map)
    roots.flatMap { root =>
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val fs = rootPath.getFileSystem(
        sparkSession.sparkContext.hadoopConfiguration)
      resolveSegments(root, map).flatMap { d =>
        val b = graft.ops.BloomMaps.read(fs, rootPath, d)
        if (b.isEmpty) None else Some(d -> b)
      }
    }.toMap
  }

  /** Schema from the first segment's parquet footer when ALL resolved
    * segments agree on the TYPED footer signature (names + types,
    * nullability relaxed like the file-source read path — round 17
    * hardened from names-only, which would have pinned the first
    * segment's types onto a same-name type-evolved list) — saves the
    * one-task datasource inference job every table bind otherwise
    * launches (Spark 4), and matches what inference would return for a
    * schema-uniform table (graft segments are all Spark-written,
    * footers carry the exact schema). Mixed-schema segment lists fall
    * back to inference, preserving the previous behavior exactly. */
  private def footerSchemaIfUniform(paths: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] = {
    if (paths.isEmpty) return None
    val sigs = paths.map(p =>
      graft.ops.AtomicPublish.segmentSchemaSignature(sparkSession, p))
    if (sigs.nonEmpty && sigs.forall(_ == sigs.head))
      graft.ops.AtomicPublish.segmentSchemaFromFooter(sparkSession, paths.head)
    else None
  }

  override def getTable(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftReadOnlyTable(tableName, sparkSession, optionsWithoutPaths,
      paths, footerSchemaIfUniform(paths), fallbackFileFormat,
      loadZones(options), loadBlooms(options))
  }

  override def getTable(options: CaseInsensitiveStringMap,
                        schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.Table = {
    val paths = getPaths(options)
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    new GraftReadOnlyTable(tableName, sparkSession, optionsWithoutPaths,
      paths, Some(schema), fallbackFileFormat, loadZones(options),
      loadBlooms(options))
  }

  /** The CATALOG's table constructor ([[GraftCatalog.loadTable]]): same
    * manifest resolution, zonemap/bloom pruning and fallback refusal as
    * [[getTable]], but returns the MANAGED table — the one whose write
    * door routes through the commit protocol ([[GraftManagedTable]])
    * instead of refusing. Only the catalog constructs it: a name
    * resolved through the warehouse is a declaration of table OWNERSHIP
    * the bare-path door never has. */
  /** The managed door does NOT refuse pending merge-on-read segments
    * the way the path door must: the DML rule
    * ([[graft.plans.GraftDmlRule]]) expands a pending table's relation
    * into the reconciled [[AtomicPublish.readOver]] plan at analysis
    * time (the view-expansion move Delta makes for deletion-vector
    * reads), so SQL `SELECT` keeps working between a MERGE/DELETE and
    * the next fold. The relation itself is built over the BASE (plain)
    * segments only — they carry the table's canonical schema — and its
    * scan builder refuses if it is ever planned WITHOUT the rule (an
    * extension-less session must not re-materialize overridden rows).
    * Time-travel loads stay strict: historical segment lists bind
    * through [[resolveSegments]]'s refusal unchanged. */
  private[sources] def getManagedTable(options: CaseInsensitiveStringMap,
                                       tableRoot: String,
                                       mergeKeys: Option[Seq[String]],
                                       props: Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val timeTravel = options.containsKey("versionAsOf") ||
      options.containsKey("timestampAsOf")
    val (paths, pendingMor) =
      if (timeTravel) (getPaths(options), false)
      else {
        val segs = AtomicPublish.currentSegments(sparkSession, tableRoot)
        if (segs.isEmpty) throw new IllegalStateException(
          s"no published version (MANIFEST) at $tableRoot")
        val pending = AtomicPublish.upsertSidecarsFor(sparkSession,
          tableRoot, segs)
        val base = segs.filterNot(pending.contains)
        require(base.nonEmpty,
          s"graft catalog at $tableRoot: every segment is a pending merge " +
            "segment — fold first (MergeInto.compactMerged)")
        (base.map(d => s"$tableRoot/$d"), pending.nonEmpty)
      }
    val tableName = getTableName(options, paths)
    val optionsWithoutPaths = getOptionsWithoutPaths(options)
    // zonemap/bloom sidecars for the resolved BASE segments only (the
    // pending ones are read through readOver's own pruning index)
    val segDirs = paths.map(p => p.substring(p.lastIndexOf('/') + 1))
    val rootPath = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = rootPath.getFileSystem(
      sparkSession.sparkContext.hadoopConfiguration)
    val zones = segDirs.flatMap { d =>
      val z = ZoneMaps.read(fs, rootPath, d)
      if (z.isEmpty) None else Some(d -> z)
    }.toMap
    val blooms = segDirs.flatMap { d =>
      val b = graft.ops.BloomMaps.read(fs, rootPath, d)
      if (b.isEmpty) None else Some(d -> b)
    }.toMap
    val inner = new GraftReadOnlyTable(tableName, sparkSession,
      optionsWithoutPaths, paths,
      userSpecifiedSchema = footerSchemaIfUniform(paths),
      fallbackFileFormat, zones, blooms)
    new GraftManagedTable(inner, sparkSession, tableRoot, mergeKeys, props,
      pendingMor)
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

/** The parquet DSv2 table with the write door welded shut (refusing in
  * `newWriteBuilder` covers the catalog V2 write routes; the V1
  * DataFrameWriter route is refused even earlier, at fallback
  * instantiation — see [[GraftWriteRefused]]) and the file index
  * swapped for the zonemap-pruning one. */
private[sources] class GraftReadOnlyTable(
    name: String,
    sparkSession: org.apache.spark.sql.SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String],
    userSpecifiedSchema: Option[org.apache.spark.sql.types.StructType],
    fallbackFileFormat: Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat],
    zones: Map[String, Map[String, ZoneMaps.ColZone]],
    blooms: Map[String, Map[String, graft.ops.BloomMaps.ColBloom]])
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
    name, sparkSession, options, paths, userSpecifiedSchema, fallbackFileFormat) {

  // Replaces FileTable's InMemoryFileIndex with the zonemap-pruning
  // subclass. Faithful to the parent's construction for this source's
  // inputs: graft paths are concrete existing directories (no globs,
  // no streaming-sink metadata), so the glob/stream-metadata branches
  // of FileTable.fileIndex can't apply to them.
  override lazy val fileIndex
      : org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex = {
    import scala.jdk.CollectionConverters._
    val caseSensitiveMap = options.asCaseSensitiveMap.asScala.toMap
    new GraftZonePruningFileIndex(sparkSession,
      paths.map(new org.apache.hadoop.fs.Path(_)),
      caseSensitiveMap, userSpecifiedSchema, zones, blooms)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    throw new UnsupportedOperationException(
      "the graft format is the READ door for published tables; writing " +
        "through it would bypass the manifest commit protocol (atomic swap, " +
        "cross-process lock, retention GC) — write via graft.ops.AtomicPublish " +
        "(publish / appendSegment) or MergeInto.upsertInto")
}

/** File index that drops whole SEGMENTS whose zonemap proves no row
  * can satisfy the scan's pushed data filters. `zones` is keyed by
  * segment directory name (the file's parent); segments without a
  * sidecar are always kept — absence of evidence is never pruning
  * evidence. Pruning happens inside `listFiles`, which Spark's V2
  * FileScan calls with the pushed partition AND data filters when it
  * plans input partitions — so the dropped segments cost zero tasks,
  * zero footer reads, zero scheduler work. PlanSpec pins the
  * file-count reduction. */
private[graft] class GraftZonePruningFileIndex(
    spark: org.apache.spark.sql.SparkSession,
    rootPaths: Seq[org.apache.hadoop.fs.Path],
    parameters: Map[String, String],
    userSpecifiedSchema: Option[org.apache.spark.sql.types.StructType],
    zones: Map[String, Map[String, ZoneMaps.ColZone]],
    blooms: Map[String, Map[String, graft.ops.BloomMaps.ColBloom]])
  extends org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
    spark, rootPaths, parameters, userSpecifiedSchema) {

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if ((zones.isEmpty && blooms.isEmpty) || dataFilters.isEmpty) base
    else base.map { pd =>
      val kept = pd.files.filter { f =>
        val seg = f.getPath.getParent
        if (seg == null) true
        else {
          val zoneOk = zones.get(seg.getName)
            .forall(zm => ZoneMaps.mightMatch(zm, dataFilters))
          val bloomOk = blooms.get(seg.getName)
            .forall(bm => graft.ops.BloomMaps.mightMatch(bm, dataFilters))
          zoneOk && bloomOk
        }
      }
      if (kept.length == pd.files.length) pd else pd.copy(files = kept)
    }
  }
}
