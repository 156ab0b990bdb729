package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4 moved
  * them behind `classic.ExpressionUtils` during the Connect refactor). This
  * is the supported pattern for libraries shipping custom Catalyst
  * expressions: one tiny file inside the sql package namespace, everything
  * else stays in graft.*.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression.
    * `toExpression` returns a LAZY `ColumnNodeExpression` wrapper whose
    * tree is connect-internal `ColumnNode`s — useless for structural
    * pattern matching; this runs the real converter, yielding ordinary
    * `UnresolvedFunction`/`UnresolvedAttribute`/`Literal` Catalyst nodes.
    */
  def toCatalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-frame a STREAMING micro-batch DataFrame as a batch frame over the
    * same physical rows (the standard V1 `Sink.addBatch` bridge — a
    * streaming-planned frame refuses batch writes). The RDD is the
    * micro-batch's materialized plan; re-wrapping it drops the streaming
    * flag without copying data.
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val session = classicDf.sparkSession
    session.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The inverse bridge: re-frame a batch DataFrame as a STREAMING one —
    * what a V1 `Source.getBatch` must return (the engine asserts
    * `isStreaming` on source output). Lazy: the wrapped RDD executes per
    * trigger, not at wrap time.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val session = classicDf.sparkSession
    session.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Wrap an (analyzed or unresolved) LogicalPlan as a DataFrame — the
    * `Dataset.ofRows` every command implementation needs (Delta's merge
    * command does exactly this with its source plan).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Clone a session with its CURRENT state (confs, temp views, catalog
    * registrations) — `cloneSession` is `private[sql]`. The view
    * expansion rule analyzes view bodies on a throwaway clone so the
    * defining-context catalog/namespace switch never mutates state a
    * concurrent analysis on the original session could observe.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Catalyst predicate → V1 `sources.Filter` (protected[sql] in
    * `DataSourceStrategy`) — the translation the streaming-scan pushdown
    * rule needs (plans/StreamScanPushdown.scala).
    */
  def translateFilterV1(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = true)

  /** The executor-local Hadoop configuration (`SparkHadoopUtil` is
    * `private[spark]`; this package object sits inside the namespace).
    * None on a driver without a SparkEnv — callers fall back.
    */
  def executorHadoopConf: Option[org.apache.hadoop.conf.Configuration] =
    try Option(org.apache.spark.deploy.SparkHadoopUtil.get.conf)
    catch { case _: Throwable => None }

  /** Register a temp SQL function on a live session (the runtime twin of
    * `SparkSessionExtensions.injectFunction` for sessions built without
    * `spark.sql.extensions`).
    */
  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
