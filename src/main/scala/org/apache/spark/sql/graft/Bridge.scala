package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for the engine's custom
  * expressions. Spark 4 removed the public `new Column(Expression)`
  * constructor; the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — hence this one-file shim inside the sql package
  * (same pattern as other Spark-native libraries; see SNIPPETS.md [2][3]).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Truncate a DataFrame's LOGICAL lineage without running a job: wrap
    * the (already planned, typically cached) physical RDD in a flat
    * LogicalRDD-backed frame. Iterative algorithms whose step plan
    * references the previous frame more than once (join + union in
    * PhashDup.clusters) otherwise DOUBLE their logical plan per
    * iteration — exponential analysis cost and a driver OOM by ~10
    * iterations. Unlike localCheckpoint this schedules no job and keeps
    * the cache as the compute shortcut; callers must have materialized
    * the cache first (the RDD re-executes the plan otherwise). */
  def flattenLineage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Register a SQL function builder on the session's registry. */
  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
