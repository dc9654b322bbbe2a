package graft.ops

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split families that respect row relationships — the reference's
  * `connex_split` surface (train_test_connex_split /
  * train_test_apart_stratify, SURVEY.md §2.10 [P]).
  *
  * `connexSplit`: rows that share a value in ANY of the key columns
  * must land in the same split (no leakage between train and test
  * through a shared entity). Model: bipartite graph of row-nodes and
  * value-nodes, one edge per (row, key value); connected components
  * collapse transitive chains (row A ~ row B via user, row B ~ row C
  * via device ⇒ A,B,C together). Components come from GraphX's Pregel
  * ConnectedComponents — O(graph diameter) supersteps of hash-join
  * message passing, the scalable alternative to driver-side union-find.
  * Whole components are then assigned by hash permille: deterministic,
  * partition-independent, no RNG.
  *
  * `stratifiedSplit`: exact per-label proportions — rank rows inside
  * each label by content hash (one key-shuffle window), first
  * ceil(f·n_label) go to test. Per-(label, split) COUNTS are a pure
  * function of the data, so they are SQL-oracle-checkable even though
  * the hash order itself is engine-specific.
  */
object ConnexSplit {

  /** @param idCol   unique row id column
    * @param keyCols columns whose shared values bind rows together
    * @return input columns + `component` (stable id) + `split`
    */
  def connexSplit(df: DataFrame, idCol: String, keyCols: Seq[String],
                  testPermille: Int, salt: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Node ids: 64-bit hashes (row-space vs value-space salted apart).
    // Collision probability is birthday-bounded (~n²/2⁶⁴) — negligible
    // below ~10⁸ nodes; above that widen to (hash, hash2) pairs.
    val rowNode = xxhash64(lit("row"), col(idCol))
    val edges = keyCols.map { k =>
        df.select(rowNode.as("src"),
          xxhash64(lit(s"val:$k"), col(k)).as("dst"))
          .where(col(k).isNotNull)
      }.reduce(_ unionByName _)
    val edgeRdd = edges.as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, ()) }
    val cc = Graph.fromEdges(edgeRdd, ()).connectedComponents().vertices
    val comp = spark.createDataFrame(cc).toDF("node", "component")
    // LEFT join: a row whose key columns are all NULL contributes no
    // edge and is absent from the vertex set — it must still be
    // assigned (a split op may not drop rows), as its own singleton
    // component (= its row-node hash; row-space ids are salted apart
    // from value-space, so no clash with real component ids).
    df.withColumn("__node", rowNode)
      .join(comp, col("__node") === col("node"), "left")
      .withColumn("component", coalesce(col("component"), col("__node")))
      .drop("__node", "node")
      .withColumn("split",
        when(pmod(xxhash64(lit(salt), col("component")), lit(1000)) < testPermille,
          lit("test")).otherwise(lit("train")))
  }

  /** Weight-balanced k-fold assignment of connected components — the
    * reference family's third member (train_test_split weighted by
    * group size). True greedy bin-packing is sequential; the scalable
    * deterministic approximation is sorted SERPENTINE assignment:
    * components ordered by (size desc, id), dealt k-at-a-time
    * alternating direction (0,1,..,k-1,k-1,..,1,0,...) — the
    * boustrophedon deal cancels the "fold 0 always takes the largest of
    * each stride" bias plain round-robin has. The component frame is one
    * row per entity group — but in the common mostly-singleton case
    * (post-dedup splits) that is ≈ the row count, so the rank runs
    * through [[DistributedSelect.withGlobalRowNumber]] (range-bucketed,
    * parallel), never a single-task no-partition window.
    *
    * @return input columns + `component` + `fold` (0..k-1)
    */
  def weightedFolds(df: DataFrame, idCol: String, keyCols: Seq[String],
                    k: Int, salt: Long): DataFrame = {
    val withComp = connexSplit(df, idCol, keyCols, testPermille = 0, salt = salt)
      .drop("split")
    val sizes = withComp.groupBy(col("component"))
      .agg(count(lit(1)).as("__sz"))
    // ORDER BY (__sz desc, component asc) ≡ (-__sz asc, component asc):
    // a distributed global row number, no single-task funnel.
    val ranked = DistributedSelect.withGlobalRowNumber(
      sizes.withColumn("__negsz", -col("__sz")), "__negsz", "component",
      rnCol = "__rn", nCol = "__nt")
    val folds = ranked
      .withColumn("__rn0", col("__rn") - 1)
      .withColumn("fold", expr(
        s"CASE WHEN (__rn0 div $k) % 2 = 0 THEN __rn0 % $k " +
          s"ELSE ${k - 1} - (__rn0 % $k) END"))
      .select(col("component"), col("fold"))
    withComp.join(folds, "component")
  }

  /** Exact per-label split: first ceil(f·n) of the hash order per label. */
  def stratifiedSplit(df: DataFrame, labelCol: String, testFraction: Double,
                      salt: Long, idCols: Column*): DataFrame = {
    val order = Window.partitionBy(col(labelCol))
      .orderBy(xxhash64(lit(salt) +: idCols: _*).asc +: idCols.map(_.asc): _*)
    val whole = Window.partitionBy(col(labelCol))
    df.withColumn("__r", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("split",
        when(col("__r") <= ceil(lit(testFraction) * col("__n")), lit("test"))
          .otherwise(lit("train")))
      .drop("__r", "__n")
  }
}
