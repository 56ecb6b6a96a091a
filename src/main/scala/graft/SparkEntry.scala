package graft

import graft.registry.{AnalyticsRegistry, ExtRegistry, ParityRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2, each with an equivalent DuckDB oracle in `oracleSql`.
 *
 * Oracle-parity conventions:
 *  - money/double aggregates go through exact integer arithmetic
 *    (`floor(x * 100)` cents) so Spark and DuckDB hash identically —
 *    no FP summation-order drift;
 *  - every computed column is aliased identically on both sides;
 *  - the synthetic source/local pair for diff queries derives
 *    deterministically from `orders` (modular arithmetic on the key)
 *    so both engines construct the same inputs.
 */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_changeset")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityRegistry.queries ++ AnalyticsRegistry.queries ++ ExtRegistry.queries

  /** DuckDB oracle per query (driver contract). The lazy tail holds
    * oracles whose SQL embeds dump-time trained-model literals
    * (`ExtRegistry.lazyOracles`) — materialized only when this def is
    * evaluated, i.e. by the Verify dump with `Shared.verifySfDir`
    * set and a session active. */
  def oracleSql: Map[String, String] =
    ParityRegistry.oracles ++ AnalyticsRegistry.oracles ++
      ExtRegistry.oracles ++ ExtRegistry.lazyOracles
}
