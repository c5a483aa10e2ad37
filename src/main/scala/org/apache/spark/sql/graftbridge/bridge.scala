package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column to a backend-agnostic node representation; the
  * Expression<->Column bridge (`org.apache.spark.sql.classic.ExpressionUtils`)
  * is `private[sql]`. This shim, placed inside the `org.apache.spark.sql`
  * package namespace (the standard extension-library idiom), re-exports just
  * the two conversions the engine's custom expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The alias name of `col.as("name")`, if the column is an alias node.
    * (`expression(c)` returns a lazy ColumnNodeExpression, NOT a catalyst
    * NamedExpression, so alias detection must look at the column node.)
    */
  def aliasName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias if a.name.size == 1 => Some(a.name.head)
    case _ => None
  }
}
