package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sequence encoders via the PUBLIC `SQLImplicits.newSequenceEncoder`
  * surface (not the internal `catalyst.encoders.ExpressionEncoder`,
  * which can shift across Spark minors). Resolved driver-side at
  * `udaf(...)` registration time, where an active session always
  * exists — never called on executors. */
private object SeqEnc {
  import scala.reflect.runtime.universe.TypeTag
  def of[T <: Seq[_] : TypeTag]: Encoder[T] =
    org.apache.spark.sql.SparkSession.active.implicits
      .newSequenceEncoder[T]
}

/**
 * Typed top-k aggregator — the custom-aggregate tier (SURVEY §7.3:
 * "Top-k similarity → custom Aggregator"). Keeps a bounded buffer of
 * the k best (score, id) pairs per group with map-side partial
 * combining, so a grouped top-k needs NO per-group sort of all rows
 * (a `row_number` window sorts every partition fully — at 100 TB the
 * difference between shuffling k rows per group and shuffling all of
 * them).
 *
 * Ordering: score descending, id ascending tie-break — deterministic.
 */
class TopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size < k || a._1 > b.last._1 ||
      (a._1 == b.last._1 && a._2 < b.last._2)) trim(a +: b)
    else b
  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    SeqEnc.of[Seq[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    SeqEnc.of[Seq[(Double, Long)]]
}

object TopK {
  /** Column form: `top_k(score, id)` → array<struct<_1 score, _2 id>>
    * of the k best, ordered best-first. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}

/**
 * Bounded "any k values" sample aggregator — `collect_list` with a
 * HARD buffer cap. `slice(collect_list(x), 1, k)` materializes the
 * FULL per-group list in one aggregation buffer before slicing —
 * unbounded executor memory when a group holds millions of rows
 * (NodeTarget's per-change-type id samples). HeadK's buffer never
 * exceeds k elements at update OR merge, and it partial-aggregates
 * map-side, so the exchange ships ≤k values per group per map task.
 * Which k values survive is arbitrary (partitioning-dependent) —
 * exactly the contract of a diagnostic sample, and no weaker than
 * collect_list's own ordering guarantee.
 */
class HeadK(k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {
  override def zero: Seq[String] = Nil
  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (b.size >= k || a == null) b else b :+ a
  override def merge(x: Seq[String], y: Seq[String]): Seq[String] =
    if (x.size >= k) x else x ++ y.take(k - x.size)
  override def finish(b: Seq[String]): Seq[String] = b
  override def bufferEncoder: Encoder[Seq[String]] =
    SeqEnc.of[Seq[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    SeqEnc.of[Seq[String]]
}

object HeadK {
  /** Column form: `head_k(x)` → array<string> of at most k of the
    * group's non-null values. */
  def headK(k: Int)(x: Column): Column =
    udaf(new HeadK(k), Encoders.STRING).apply(x)
}
