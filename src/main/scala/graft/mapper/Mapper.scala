package graft.mapper

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative column mapping — the Spark-native equivalent of the
 * reference's `Mapper` (reference: Classes/Mapper.php:24-49).
 *
 * Each target column is produced by a rule that is either:
 *  - a verbatim source attribute name (missing attribute ⇒ NULL,
 *    Mapper.php:39-40 — note the asymmetry with keying, where a
 *    missing id/version IS an error);
 *  - an expression wrapped in `${...}` (the reference evaluates Eel,
 *    EelEvaluator.php:28-50; we evaluate Spark SQL via `expr()` — a
 *    strict superset for string/date/math work). `record.foo`
 *    references are rewritten to plain column references, matching the
 *    Eel context convention (README.md:238-240).
 *
 * The `${...}` detection mirrors `EelEvaluator::isEelExpression`
 * (EelEvaluator.php:28-31).
 *
 * Everything is a `Column` expression — codegen'd, no UDFs. Custom
 * helpers register through [[Helpers.register]] as named SQL
 * functions with inlined bodies, usable inside `${...}` rules.
 */
final case class Mapper(rules: Seq[(String, String)]) {

  /** Build the projection for one target column. */
  private def columnFor(df: DataFrame, rule: String): Column =
    Mapper.asExpression(rule) match {
      case Some(e) =>
        expr(Mapper.rewriteRecordRefs(e))
      case None =>
        // missing attribute ⇒ NULL (typed: parquet can't hold
        // NullType). Name matching is case-insensitive, like Spark's
        // own column resolution (JDBC dialects uppercase identifiers).
        df.columns.find(_.equalsIgnoreCase(rule)) match {
          case Some(actual) => col(actual)
          case None => lit(null).cast(org.apache.spark.sql.types.StringType)
        }
    }

  /** Apply the mapping as a single narrow projection. */
  def apply(df: DataFrame): DataFrame =
    df.select(rules.map { case (target, rule) =>
      columnFor(df, rule).as(target)
    }: _*)

  /** Apply while retaining the engine's `__id`/`__version` metadata
    * columns (the sink needs `__id` for UPDATE/DELETE targeting),
    * plus any `extra` engine columns a sink threads through (e.g.
    * NodeTarget's resolved `__parent` path). */
  def applyKeeping(df: DataFrame, extra: Seq[String]): DataFrame = {
    val keep =
      (Seq(graft.core.Records.IdCol, graft.core.Records.VersionCol) ++ extra)
        .filter(df.columns.contains).map(c => col(c).as(c))
    df.select(keep ++ rules.map { case (target, rule) =>
      columnFor(df, rule).as(target)
    }: _*)
  }

  def applyKeepingKeys(df: DataFrame): DataFrame = applyKeeping(df, Nil)
}

object Mapper {
  private val ExpressionPattern = """^\$\{(.+)\}$""".r

  /** `${...}` envelope detection (EelEvaluator.php:28-31). */
  def asExpression(rule: String): Option[String] = rule.trim match {
    case ExpressionPattern(inner) => Some(inner)
    case _ => None
  }

  /** Rewrite `record.foo` → `foo`, skipping single-quoted literals. */
  def rewriteRecordRefs(e: String): String =
    """('[^']*')|\brecord\.([A-Za-z_][A-Za-z0-9_]*)""".r
      .replaceAllIn(e, m =>
        java.util.regex.Matcher.quoteReplacement(
          if (m.group(1) != null) m.group(1) else m.group(2)))

  /** Identity mapper: pass every column through unchanged. */
  def identity(df: DataFrame): Mapper =
    Mapper(df.columns.filterNot(_.startsWith("__")).map(c => c -> c).toSeq)
}
