package org.apache.spark.sql.graftx

import org.apache.spark.QueryContext
import org.apache.spark.sql.errors.QueryExecutionErrors

/** Bridge into the `private[sql]` error factories so native expressions
  * raise the SAME error classes (and query-context fragments) the
  * built-ins they substitute for raise — the [[ColumnBridge]] doctrine.
  * Generated code calls the factory directly (Janino links against the
  * public bytecode); this bridge serves the interpreted eval path. */
object ErrorBridge {
  def divideByZeroError(context: QueryContext): ArithmeticException =
    QueryExecutionErrors.divideByZeroError(context)
}
