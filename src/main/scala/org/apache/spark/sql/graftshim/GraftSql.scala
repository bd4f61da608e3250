package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: wrapping a custom Catalyst
  * `Expression` into a public `Column` (and back) has no public API in
  * Spark 4's classic frontend — `ExpressionUtils.column` is the blessed
  * internal route (the built-in `functions` object uses the same path).
  * Nothing else internal leaks through here.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD a `localCheckpoint(eager = true)` pinned for this Dataset, if
    * any: the checkpointed plan is a `LogicalRDD` leaf wrapping the
    * persisted internal-row RDD. Lets callers unpersist exactly their own
    * checkpoint blocks instead of diffing the context-wide persistent-RDD
    * registry (which misclassifies RDDs persisted concurrently by anyone
    * else on the session). */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Non-blocking read of an [[org.apache.spark.sql.Observation]]'s
    * metrics row — `getRowOrEmpty` is `private[spark]`; this is the only
    * way to ask "did the action that materialized the observed frame
    * deliver metrics?" without the indefinite block of `get`. */
  def observedRow(obs: org.apache.spark.sql.Observation)
      : Option[org.apache.spark.sql.Row] =
    obs.getRowOrEmpty
}
