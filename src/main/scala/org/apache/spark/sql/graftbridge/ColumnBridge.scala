package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters.
  * Lives under `org.apache.spark.sql` so the package-private accessors
  * resolve; everything else in this project stays in `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Registry-resolved function call — same resolution path as SQL. */
  def fn(name: String, args: Column*): Column = Column.fn(name, args: _*)

  /** Applies a SparkSessionExtensions configurator to an existing session's
    * function registry — the testable equivalent of the static
    * `spark.sql.extensions` conf (which only applies at SparkContext
    * creation). */
  def applyFunctionExtensions(spark: org.apache.spark.sql.SparkSession,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit): Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }

  /** Seeded 64-bit xxHash of the given columns (functions.xxhash64 pins
    * seed=42; MinHash/SimHash need a hash family, i.e. many seeds). Native
    * codegen'd Catalyst expression — no UDF in the hot path. */
  def xxhash64(seed: Long, cols: Column*): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        cols.map(ExpressionUtils.expression), seed))
}
