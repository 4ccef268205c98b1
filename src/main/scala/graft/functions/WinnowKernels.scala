package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
  * MOSS algorithm): hash every k-char shingle, slide a window of `w`
  * consecutive hashes, select the MINIMUM of each window (rightmost on
  * ties, the paper's density rule), and return the distinct selected
  * hashes. The paper's guarantee: any substring match of length >=
  * `w + k - 1` between two documents yields at least one SHARED selected
  * fingerprint — which makes the fingerprint set a corpus-linear,
  * bucket-joinable candidate generator for LOCAL/subset duplication (the
  * production path behind the exact containment demo: ~n/w fingerprints
  * per doc instead of quadratic pair enumeration).
  *
  * One pass, O(n) via a monotonic deque (not the naive O(n·w) rescan):
  * hashes chain from seed 42 like every other text kernel
  * (xxhash64 over the shingle's UTF-8 bytes — MinHashKernels' shingle
  * hash exactly, so signatures are comparable across operators). */
object WinnowKernels {

  def winnowFps(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val nChars = text.numChars()
    val n = math.max(nChars - k + 1, 1)
    // each shingle hashes its bytes in place via the shared offset table
    // (TextKernels.charOffsets — substringSQL per shingle would be O(n²))
    val charOff = TextKernels.charOffsets(text)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = charOff(i)
      val e = charOff(math.min(i + k, nChars))
      h(i) = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      i += 1
    }
    if (n <= w) {
      // a single window spans everything: global rightmost minimum
      var best = 0
      i = 1
      while (i < n) { if (h(i) <= h(best)) best = i; i += 1 }
      return new GenericArrayData(Array(h(best)))
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices with strictly increasing hashes; equals
    // are popped on insert so the surviving duplicate is the rightmost
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      val winStart = i - w + 1
      if (winStart >= 0) {
        while (dq(head) < winStart) head += 1
        selected.add(h(dq(head)))
      }
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fps(text)` → sorted distinct `array<long>` of winnowed
  * fingerprints (k and w baked into the plan as literals). */
case class WinnowFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")
  require(w > 0, s"w must be positive, got $w")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernels.winnowFps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowKernels.winnowFps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** Column wrapper. */
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(text), k, w))
}
