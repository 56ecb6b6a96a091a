package graft.mapper

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Named helper registry for `${...}` mapping expressions — the Spark
 * equivalent of the reference's custom Eel helpers configured per
 * preset (reference: Classes/EelEvaluator.php:23-26, README.md:240).
 *
 * Helpers become session SQL functions, so `${cents(record.price)}`
 * resolves through the Mapper's normal `expr()` path. The primary
 * route is a SQL-bodied function (Spark 4 SQL UDF): the body is
 * INLINED into the plan at analysis time, so helper calls stay inside
 * whole-stage codegen — no black-box UDF in the hot path.
 */
object Helpers {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"

  /**
   * Register a SQL-bodied helper, e.g.
   * `register(spark, "cents", "x DOUBLE", "CAST(floor(x * 100) AS BIGINT)")`
   * → usable as `${cents(record.price)}` in mapping rules.
   */
  def register(
      spark: SparkSession, name: String,
      params: String, body: String): Unit = {
    require(name.matches(Ident), s"helper name '$name' is not an identifier")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURN $body")
  }

  /** Register a Catalyst expression builder under a name — the route
    * for helpers that need a custom `Expression` (same registry the
    * engine's own `cosine_sim`/`parse_version` use,
    * [[graft.functions.GraftFunctions.register]]). */
  def registerExpression(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    require(name.matches(Ident), s"helper name '$name' is not an identifier")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "graft-helper")
  }
}
