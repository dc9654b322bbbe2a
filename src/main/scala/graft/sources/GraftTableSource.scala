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
  * READ door only: writes must go through [[AtomicPublish]] (publish /
  * appendSegment / compactSegments), which is what provides atomicity,
  * the cross-process commit lock, and GC. A `format("graft")` write
  * would land unmanifested files and is not part of the contract.
  * Kind-structured INDEX tables (semantic/ivf: `assign/` + `model/`
  * inside each segment) are exposed through
  * [[graft.ops.DedupIndex.registerIndexViews]] instead — their
  * segments are not flat parquet directories.
  */
class GraftTableSource extends ParquetDataSourceV2 {

  override def shortName(): String = "graft"

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
}
