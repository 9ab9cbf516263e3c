package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB-runnable ANSI oracle SQL.
  *
  * Each operator family (SSB parity, dedup, similarity, text, events, …)
  * contributes one pack; [[SparkEntry]] concatenates them. `oracles` keys
  * must be a subset of `queries` keys; a query without an oracle gets the
  * driver's weaker rows-only check (allowed for non-SQL-expressible ops).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
