package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Intersection cardinality of two SORTED distinct string arrays as one
  * allocation-free merge (X2 verification perf path).
  *
  * `size(array_intersect(a, b))` builds a hash set of one side and an
  * output array per row pair; for the Jaccard verify join — whose inputs
  * are the already-sorted shingle-set arrays of
  * [[graft.ext.TextDedup.docSetsOf]] — a two-pointer merge needs O(n+m)
  * comparisons, no hashing, and no intermediate array. Binary UTF8String
  * comparison equals the lexicographic order `sort_array` produced, and
  * the count of common distinct elements is exactly what
  * `len(list_intersect(...))` yields in the DuckDB oracle — values are
  * unchanged, only the kernel is.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  private val FnName = "graft_sorted_intersect_size"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")

  /** Intersection size of two sorted distinct string arrays as a Column;
    * caller must have registered on the session.
    */
  def intersectSize(a: Column, b: Column): Column = call_function(FnName, a, b)
}

/** Intersection MEMBERS of two SORTED distinct BIGINT arrays as one
  * allocation-lean merge — the primitive-long sibling of
  * [[SortedIntersectSize]], for kernels that need the common elements
  * themselves (the triangle counter's per-corner attribution).
  * `array_intersect` hashes one side per row with boxed elements; over
  * the Σ outdeg² cells of a graph edge-iterator that boxing dominates
  * the profile. Here: a two-pointer merge over primitive `getLong`s
  * into one `long[]`, wrapped via `UnsafeArrayData.fromPrimitiveArray`
  * (no per-element allocation). Inputs sorted+distinct is the caller's
  * contract (`sort_array(collect_set(...))` provides it).
  */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect_longs"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { buf(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $buf[$c++] = $xv; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectLongs {
  private val FnName = "graft_sorted_intersect_longs"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => SortedIntersectLongs(exprs(0), exprs(1)), "built-in")

  /** Intersection of two sorted distinct long arrays as a Column; caller
    * must have registered on the session.
    */
  def intersect(a: Column, b: Column): Column = call_function(FnName, a, b)
}
