package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Task-side worker for the BPE trainer's speculate-verify rounds (see
  * `graft.operators.BpeTrainer`): given a word's symbol array and type
  * frequency `n`, it
  *
  *   1. applies the driver-CONFIRMED `pending` merges (no emission — these
  *      are already part of the logical vocabulary state, just not yet
  *      rewritten into the stored frame),
  *   2. emits the word's step-0 gram bag — every adjacent pair (and, when
  *      `emitTriples`, every adjacent triple) keyed with the trainer's
  *      U+0001 separator, weighted `+n` — whose global aggregation IS the
  *      exact pair/triple count table of the current state,
  *   3. then applies the SPECULATED merges in order, emitting after each
  *      step the exact gram-bag delta (multiset difference of the word's
  *      adjacent pairs — and triples, when `emitTriples` — × n) so the
  *      driver can reconstruct the exact global pair-count table after
  *      every speculated prefix and verify the speculation against true
  *      greedy order (triple deltas only keep the speculation heuristic's
  *      context view current; verification is pairs-only).
  *
  * The merge application is byte-identical to [[TextKernels.mergePair]]
  * (greedy left-to-right, non-overlapping) — the same kernel the rewrite
  * projection uses, so confirmed merges replay identically.
  *
  * Output rows: `(step int, key string, v long)`; step 0 = base bag,
  * step k ≥ 1 = delta after speculated merge k. Unaffected words emit no
  * delta rows for a step.
  */
class BpeSpeculator(
    pending: Array[(String, String)],
    spec: Array[(String, String)],
    emitTriples: Boolean) extends Serializable {

  @transient private lazy val sep = UTF8String.fromString("\u0001")
  @transient private lazy val pendingU =
    pending.map(p => (UTF8String.fromString(p._1), UTF8String.fromString(p._2)))
  @transient private lazy val specU =
    spec.map(p => (UTF8String.fromString(p._1), UTF8String.fromString(p._2)))

  private def toSyms(arr: ArrayData): Array[UTF8String] = {
    val n = arr.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
    out
  }

  /** Greedy left-to-right non-overlapping merge — [[TextKernels.mergePair]]
    * on a plain array (vocab arrays are null-free by construction). */
  private def merge(s: Array[UTF8String], a: UTF8String, b: UTF8String)
      : Array[UTF8String] = {
    val out = Array.newBuilder[UTF8String]
    out.sizeHint(s.length)
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && a.equals(s(i)) && b.equals(s(i + 1))) {
        out += UTF8String.concat(s(i), s(i + 1)); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def containsPair(s: Array[UTF8String], a: UTF8String, b: UTF8String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (a.equals(s(i)) && b.equals(s(i + 1))) return true
      i += 1
    }
    false
  }

  private def addBag(s: Array[UTF8String], sign: Long,
      acc: java.util.HashMap[UTF8String, Long]): Unit = {
    var i = 0
    while (i < s.length - 1) {
      val k = UTF8String.concat(s(i), sep, s(i + 1))
      acc.merge(k, sign, (x, y) => x + y)
      if (emitTriples && i < s.length - 2)
        acc.merge(UTF8String.concat(s(i), sep, s(i + 1), sep, s(i + 2)), sign,
          (x, y) => x + y)
      i += 1
    }
  }

  def run(arr: ArrayData, n: Long): ArrayData = {
    var syms = toSyms(arr)
    var pi = 0
    while (pi < pendingU.length) {
      val (a, b) = pendingU(pi)
      if (containsPair(syms, a, b)) syms = merge(syms, a, b)
      pi += 1
    }
    val out = new java.util.ArrayList[Any]()
    def row(step: Int, key: UTF8String, v: Long): GenericInternalRow =
      new GenericInternalRow(Array[Any](step, key, v))
    var i = 0
    while (i < syms.length - 1) {
      out.add(row(0, UTF8String.concat(syms(i), sep, syms(i + 1)), n))
      if (emitTriples && i < syms.length - 2)
        out.add(row(0, UTF8String.concat(syms(i), sep, syms(i + 1), sep, syms(i + 2)), n))
      i += 1
    }
    var k = 0
    while (k < specU.length) {
      val (a, b) = specU(k)
      if (containsPair(syms, a, b)) {
        val after = merge(syms, a, b)
        val diff = new java.util.HashMap[UTF8String, Long]()
        addBag(after, 1L, diff)
        addBag(syms, -1L, diff)
        val step = k + 1
        diff.forEach { (key, c) => if (c != 0L) out.add(row(step, key, c * n)) }
        syms = after
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_speculate(sym, n)` — see [[BpeSpeculator]]. The merge lists are
  * plan constants (a fresh expression per trainer round, the
  * MergePair-literal discipline). */
case class BpeSpeculate(left: Expression, right: Expression,
    pending: Seq[(String, String)], spec: Seq[(String, String)],
    emitTriples: Boolean)
  extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val speculator =
    new BpeSpeculator(pending.toArray, spec.toArray, emitTriples)

  override def inputTypes = Seq(ArrayType(StringType), LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bpe_speculate"

  override protected def nullSafeEval(sym: Any, n: Any): Any =
    speculator.run(sym.asInstanceOf[ArrayData], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("speculator",
      new BpeSpeculator(pending.toArray, spec.toArray, emitTriples),
      classOf[BpeSpeculator].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.run($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeSpeculate =
    copy(left = newLeft, right = newRight)
}

object BpeSpeculate {
  /** Column wrapper. */
  def apply(sym: Column, n: Column, pending: Seq[(String, String)],
      spec: Seq[(String, String)], emitTriples: Boolean): Column =
    ColumnBridge.column(BpeSpeculate(
      ColumnBridge.expression(sym), ColumnBridge.expression(n),
      pending, spec, emitTriples))
}
