package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values (KMV) distinct-count sketch as a typed
  * [[Aggregator]], registered through `functions.udaf` — the modern UDAF
  * surface (SURVEY §2.10 note; the deprecated
  * UserDefinedAggregateFunction is deliberately not used).
  *
  * The sketch state is the k lexicographically smallest DISTINCT md5 hex
  * strings seen — a pure set property, so the result is independent of
  * row order and partitioning (unlike HLL register races or float-sum
  * drift, a KMV over md5 is bit-deterministic and engine-portable, which
  * is why this sketch can be DuckDB-oracled EXACTLY rather than gated as
  * a bound). Estimate derivation ((k-1) / U_(k)) happens outside the
  * aggregator on the returned k-th minimum.
  *
  * Scale shape: constant-size state (k strings) per group, associative
  * merge — Spark plans it as ObjectHashAggregate with partial merge, so
  * the shuffle carries one k-element buffer per (partition, group), not
  * rows.
  */
class KmvMinK(k: Int) extends Aggregator[String, Seq[String], String] {
  require(k > 0)

  def zero: Seq[String] = Nil

  def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null || b.contains(a)) b
    else if (b.size < k) (b :+ a).sorted
    else if (a < b.last) ((b :+ a).sorted).take(k)
    else b

  def merge(x: Seq[String], y: Seq[String]): Seq[String] = {
    val m = (x ++ y).distinct.sorted
    if (m.size > k) m.take(k) else m
  }

  /** The k-th minimum, or null when the group holds fewer than k
    * distinct values (callers fall back to the exact count there).
    */
  def finish(b: Seq[String]): String =
    if (b.size == k) b.last else null

  def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  def outputEncoder: Encoder[String] = Encoders.STRING
}

/** The same KMV state, finished as the FULL sorted k-minimum sample set
  * instead of just the k-th minimum — the form set-operation estimators
  * need (intersection/overlap work on the samples themselves, not only
  * the threshold; see Beyer et al., SIGMOD'07). Same constant-size
  * associative state, same ObjectHashAggregate partial-merge shape.
  */
class KmvSampleSet(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  private val inner = new KmvMinK(k)
  def zero: Seq[String] = inner.zero
  def reduce(b: Seq[String], a: String): Seq[String] = inner.reduce(b, a)
  def merge(x: Seq[String], y: Seq[String]): Seq[String] = inner.merge(x, y)
  def finish(b: Seq[String]): Seq[String] = b
  def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
