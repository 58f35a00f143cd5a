package org.apache.spark.sql.graftglue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-level function registration (the `sessionState` accessor is
  * `private[sql]` in Spark 4, same story as [[ColumnGlue]]). */
object FunctionGlue {
  def registerTemp(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
