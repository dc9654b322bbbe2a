/* Bridge into Spark's private[sql] surface — the ONLY file outside the
 * graft namespace. `Dataset.ofRows` (wrap a constructed LogicalPlan as
 * a DataFrame) has no public equivalent in Spark 4.1; every extension
 * library that builds custom logical operators uses this same
 * package-placement pattern to reach it. Nothing else is accessed.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

object GraftSqlBridge {
  /** Wrap an analyzed LogicalPlan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
