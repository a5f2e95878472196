package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the direct constructors
  * `private[sql]`; this shim lives under `org.apache.spark.sql` so custom
  * Catalyst expressions (e.g. [[graft.functions.FloatVectorDot]]) can be
  * exposed as `Column`s — the same access pattern third-party Spark
  * extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression as a SQL temp function on a LIVE session
    * (the `SparkSessionExtensions` path in [[graft.GraftExtensions]] only
    * applies to sessions created after the extension is attached).
    */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
