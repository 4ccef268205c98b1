package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection cardinality of two SORTED long arrays as a native codegen'd
  * Catalyst expression: a single merge pass, no hash set, no allocation per
  * row — built for pairwise set-similarity joins where
  * `size(array_intersect(a, b))` (which builds a hash set per pair and
  * falls out of whole-stage codegen) dominates the runtime.
  *
  * Caller contract: both arrays are distinct and ascending (e.g.
  * `array_sort(array_distinct(...))`); null elements are not expected.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
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
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $i = 0, $j = 0;
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |long ${ev.value}_c = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u == $v) { ${ev.value}_c++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Early-exit containment threshold over two SORTED long arrays:
  * `true` iff `floor(|a∩b| * 1e6 / max(min(|a|,|b|), 1)) >= minPpm` —
  * EXACTLY the predicate `floor-div(intersect) >= minPpm`, but the merge
  * aborts the moment the bound `matched + min(remaining)` can no longer
  * reach the needed count (and succeeds the moment it is reached). On the
  * dominant non-qualifying pairs of a high-threshold containment join the
  * pass touches a small fraction of the arrays instead of all of both, so
  * the expensive exact count runs only for the few survivors.
  *
  * Same caller contract as [[SortedIntersectCount]]: distinct ascending
  * arrays, no null elements. */
case class ContainmentAtLeast(left: Expression, right: Expression, minPpm: Long)
  extends BinaryExpression with ExpectsInputTypes {

  require(minPpm >= 0L && minPpm <= 1000000L,
    s"minPpm must be in [0, 1000000], got $minPpm")

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "containment_at_least"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ContainmentAtLeast.atLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], minPpm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ContainmentAtLeast.atLeast($a, $b, ${minPpm}L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentAtLeast =
    copy(left = newLeft, right = newRight)
}

/** Early-exit JACCARD threshold over two SORTED long arrays: `true` iff
  * `floor(|a∩b| * 1e6 / max(|a∪b|, 1)) >= minPpm` — EXACTLY the
  * `floor-div(intersect/union) >= minPpm` predicate the pair builders
  * filter on, but the merge aborts the moment the bound
  * `matched + min(remaining)` can no longer reach the needed count (and
  * succeeds the moment it is reached). Derivation: with
  * `union = n + m - inter`, the predicate `inter * 1e6 >= minPpm * union`
  * rearranges to `inter * (1e6 + minPpm) >= minPpm * (n + m)`, i.e.
  * `inter >= ceil(minPpm * (n+m) / (1e6 + minPpm))` — a constant
  * computable BEFORE the merge, unlike the union itself. On the dominant
  * non-qualifying pairs of a high-threshold join the pass touches a small
  * fraction of the arrays; the exact count then runs only for the few
  * survivors (the ContainmentAtLeast two-phase discipline).
  *
  * Same caller contract as [[SortedIntersectCount]]: distinct ascending
  * arrays, no null elements. */
case class JaccardAtLeast(left: Expression, right: Expression, minPpm: Long)
  extends BinaryExpression with ExpectsInputTypes {

  require(minPpm >= 0L && minPpm <= 1000000L,
    s"minPpm must be in [0, 1000000], got $minPpm")

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "jaccard_at_least"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardAtLeast.atLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], minPpm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardAtLeast.atLeast($a, $b, ${minPpm}L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardAtLeast =
    copy(left = newLeft, right = newRight)
}

object JaccardAtLeast {
  /** Column wrapper. */
  def apply(a: Column, b: Column, minPpm: Long): Column =
    ColumnBridge.column(JaccardAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b), minPpm))

  /** The merge pass with two-sided early exit. `need` is derived in the
    * scaladoc above; `inter >= ceil(A/B)` ⟺ `inter * B >= A` for
    * non-negative integers, so passing `need` is exactly the floor-div
    * predicate. Empty-both (union clamped to 1 by the callers) yields
    * jaccard 0, matching `minPpm <= 0`. */
  def atLeast(x: ArrayData, y: ArrayData, minPpm: Long): Boolean = {
    val n = x.numElements()
    val m = y.numElements()
    val total = n.toLong + m.toLong
    if (total == 0L) return minPpm <= 0L
    val b = 1000000L + minPpm
    val need = (minPpm * total + b - 1L) / b
    if (need <= 0L) return true
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (c >= need) return true
      if (c + math.min(n - i, m - j) < need) return false
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c >= need
  }
}

object ContainmentAtLeast {
  /** Column wrapper. */
  def apply(a: Column, b: Column, minPpm: Long): Column =
    ColumnBridge.column(ContainmentAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b), minPpm))

  /** The merge pass with two-sided early exit. Pass condition
    * `inter * 1e6 >= minPpm * minSize` (⟺ the floor-div predicate for
    * non-negative ints) becomes `inter >= need`, `need =
    * ceil(minPpm * minSize / 1e6)`. */
  def atLeast(x: ArrayData, y: ArrayData, minPpm: Long): Boolean = {
    val n = x.numElements()
    val m = y.numElements()
    val minSize = math.min(n, m).toLong
    if (minSize == 0L) return minPpm <= 0L // inter=0, denominator clamps to 1
    val need = (minPpm * minSize + 999999L) / 1000000L
    if (need <= 0L) return true
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (c >= need) return true
      if (c + math.min(n - i, m - j) < need) return false
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c >= need
  }
}
