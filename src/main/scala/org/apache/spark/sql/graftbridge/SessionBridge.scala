package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Session-internals bridge (classic runtime): the FunctionRegistry
  * accessor is `private[sql]`, so late registration into an
  * already-constructed session (sessions the caller didn't build, e.g.
  * notebook/test harnesses without `spark.sql.extensions`) needs this
  * one-liner inside the `org.apache.spark.sql` package. Sessions built
  * with [[graft.plans.GraftExtensions]] don't need it.
  */
object SessionBridge {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
