package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver's oracle runs on the same parquet
  * tables. Keeping both sides in one value keeps column aliases in sync —
  * the driver's comparator sorts columns by name before hashing, so every
  * computed column must carry the same alias in both dialects.
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String])

object OracleQuery {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): OracleQuery =
    OracleQuery(name, run, Some(sql))

  /** Non-SQL-expressible operator → driver records a weaker rows-only check. */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): OracleQuery =
    OracleQuery(name, run, None)
}
