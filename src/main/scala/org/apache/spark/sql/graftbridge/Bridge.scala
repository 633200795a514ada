package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column↔Expression constructors
  * (Spark 4 sql-api split). Pattern as in public Spark extensions
  * (repo:SNIPPETS.md [2],[3]). Keep this the ONLY file outside the graft
  * package namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Stable per-session id (`private[sql]` in Spark 4) — used to key
    * session-scoped memos WITHOUT retaining the session object itself. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
