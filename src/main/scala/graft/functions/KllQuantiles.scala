package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Mergeable quantile sketch over a LONG column — a deterministic KLL/MRL
  * compactor hierarchy (Karnin–Lang–Liberty, FOCS 2016; Manku–Rajagopalan–
  * Lindsay, SIGMOD 1998): level i holds items of weight 2^i; a full level
  * sorts, keeps every other element (alternating offset per compaction so
  * the bias cancels), and promotes the survivors one level up. Weight is
  * conserved exactly, so total weight always equals the input count.
  *
  * Why it exists: the exact path (`percentile` / sort) shuffles or
  * re-scans the value population; at 100 TB "p99 document length" must be
  * a map-side O(k log(n/k)) summary whose partials merge associatively —
  * the exchange ships a few KB per partition, never the value column.
  * Same discipline as [[MisraGries]]: declared query is rows-only, the
  * guarantees are spec-pinned (QuantileSketchSpec): exact below capacity,
  * rank error within epsilon·n above it, deterministic across reruns.
  *
  * eval emits array<struct<q:double, est:long>> — for each requested
  * quantile q, the smallest summary value whose cumulative weight reaches
  * ceil(q·W) (the lower-quantile rule; exact-sample case matches SQL
  * `percentile_disc`).
  */
final class KllBuffer(val k: Int) {
  // level i: first sizes(i) entries of levels(i) are live, weight 2^i
  var levels: Array[Array[Long]] = Array(new Array[Long](2 * k))
  var sizes: Array[Int] = Array(0)
  var compactions: Array[Long] = Array(0L) // per-level counter → offset parity

  private def ensureLevel(i: Int): Unit = {
    while (levels.length <= i) {
      levels = levels :+ new Array[Long](2 * k)
      sizes = sizes :+ 0
      compactions = compactions :+ 0L
    }
  }

  def add(v: Long): Unit = {
    val lvl0 = levels(0)
    lvl0(sizes(0)) = v
    sizes(0) += 1
    if (sizes(0) >= k) compact(0)
  }

  /** Sort level i, promote alternating survivors to level i+1, cascade. */
  private def compact(i: Int): Unit = {
    ensureLevel(i + 1)
    val buf = levels(i)
    val n = sizes(i)
    java.util.Arrays.sort(buf, 0, n)
    val even = n - (n & 1) // odd tail element stays at this level
    val offset = (compactions(i) & 1L).toInt
    compactions(i) += 1
    val up = levels(i + 1)
    var j = offset
    var w = sizes(i + 1)
    while (j < even) { up(w) = buf(j); w += 1; j += 2 }
    sizes(i + 1) = w
    if (n > even) { buf(0) = buf(even); sizes(i) = 1 } else sizes(i) = 0
    if (sizes(i + 1) >= k) compact(i + 1)
  }

  def mergeIn(other: KllBuffer): Unit = {
    var i = 0
    while (i < other.levels.length) {
      ensureLevel(i)
      var j = 0
      while (j < other.sizes(i)) {
        val lvl = levels(i)
        lvl(sizes(i)) = other.levels(i)(j)
        sizes(i) += 1
        if (sizes(i) >= k) compact(i)
        j += 1
      }
      i += 1
    }
  }

  def totalWeight: Long = {
    var w = 0L
    var i = 0
    while (i < levels.length) { w += sizes(i).toLong << i; i += 1 }
    w
  }

  /** All live (value, weight) pairs sorted by value. */
  def weighted: Array[(Long, Long)] = {
    var n = 0
    var i = 0
    while (i < levels.length) { n += sizes(i); i += 1 }
    val out = new Array[(Long, Long)](n)
    var w = 0
    i = 0
    while (i < levels.length) {
      var j = 0
      while (j < sizes(i)) { out(w) = (levels(i)(j), 1L << i); w += 1; j += 1 }
      i += 1
    }
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int =
        java.lang.Long.compare(a._1, b._1)
    })
    out
  }

  /** Smallest value whose cumulative weight >= ceil(q·W); the max for q=1. */
  def quantile(sorted: Array[(Long, Long)], w: Long, q: Double): Long = {
    if (sorted.isEmpty) return 0L
    val target = math.max(1L, math.ceil(q * w).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted(sorted.length - 1)._1
  }
}

case class KllQuantiles(
    child: Expression,
    k: Int,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with UnaryLike[Expression] {

  require(k >= 8, "sketch capacity k must be >= 8")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0, 1]")

  override def prettyName: String = "kll_quantiles"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any = {
    val sorted = buf.weighted
    val w = buf.totalWeight
    new GenericArrayData(quantiles.map { q =>
      new GenericInternalRow(Array[Any](q, buf.quantile(sorted, w, q)))
    }.toArray)
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      out.writeInt(buf.sizes(i))
      out.writeLong(buf.compactions(i))
      var j = 0
      while (j < buf.sizes(i)) { out.writeLong(buf.levels(i)(j)); j += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    val nLevels = in.readInt()
    var i = 0
    while (i < nLevels) {
      val sz = in.readInt()
      val cc = in.readLong()
      if (i > 0) {
        buf.levels = buf.levels :+ new Array[Long](2 * buf.k)
        buf.sizes = buf.sizes :+ 0
        buf.compactions = buf.compactions :+ 0L
      }
      buf.sizes(i) = sz
      buf.compactions(i) = cc
      var j = 0
      while (j < sz) { buf.levels(i)(j) = in.readLong(); j += 1 }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllQuantiles {
  /** Column wrapper: sketch-quantiles of a long column at capacity k. */
  def apply(c: Column, k: Int, qs: Seq[Double]): Column =
    ColumnBridge.column(KllQuantiles(ColumnBridge.expression(c), k, qs)
      .toAggregateExpression())
}
