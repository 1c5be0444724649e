package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join prefilter (scale path for selective shuffle joins).
  *
  * When a shuffle join's build side is too big to broadcast but still
  * selective, shipping a Bloom filter of its keys to the probe side drops
  * most non-matching rows BEFORE the probe side pays the exchange — at
  * 100 TB that turns "shuffle everything, discard 95% in the join" into
  * "shuffle the 5%". Spark's own runtime row-group/semi-join filters do
  * this opportunistically; this operator is the explicit, plannable form.
  *
  * The sketch is built with the public `DataFrameStatFunctions.bloomFilter`
  * aggregate (distributed build, driver holds only the fixed-size bitmap —
  * same cost class as a broadcast hash relation, tunable via fpp), and the
  * probe is a custom codegen'd [[UnaryExpression]] so the membership test
  * stays inside whole-stage codegen with zero boxing. No false negatives,
  * so composing with the exact join preserves semantics bit-for-bit; false
  * positives only cost wasted shuffle rows (fpp-bounded).
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomPrefilter {
  private val fnId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Build a Bloom filter over `build.keyCol` (distributed aggregate via
    * the public `DataFrameStatFunctions.bloomFilter`; `expectedKeys` sizes
    * the bitmap, 0.01 fpp costs ~9.6 bits/key) and return the membership
    * predicate over `probeKey`, registered on the session's function
    * registry (the [[CosineSim]] pattern).
    *
    * Each call registers under a UNIQUE name: `call_function` resolves
    * lazily at analysis time, so a shared fixed name would bind every
    * outstanding predicate to the LAST-built bloom (wrong-key membership
    * ⟹ silent false negatives) whenever two prefilters are built before
    * their consumers are analyzed. Registrations are tiny and bounded by
    * prefilter calls per session, so they are simply left in place.
    */
  def prefilter(build: DataFrame, keyCol: String, expectedKeys: Long,
                fpp: Double = 0.01)(probeKey: Column): Column = {
    val bloom = build.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val spark = build.sparkSession
    val fnName = s"graft_bloom_might_contain_${fnId.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => BloomMightContainLong(exprs.head, bloom), "built-in")
    call_function(fnName, probeKey)
  }
}
