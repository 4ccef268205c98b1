package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Mergeable Misra–Gries heavy-hitters summary as a native aggregate — the
  * one-pass, bounded-memory frequent-items sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Why it exists: the exact vocabulary path (`TextAnalysis.termCounts`)
  * shuffles the FULL vocabulary — fine when the vocab is millions of rows,
  * wrong when a 100 TB scan only needs "the top few hundred tokens" (stop
  * word discovery, boilerplate token screens, mix diagnostics). This
  * summary holds at most `k` counters per partial aggregate, merges
  * associatively on the map side, and ships O(k) bytes per partition
  * instead of the token population: the shuffle disappears into the scan.
  *
  * Guarantees (over total item count n, capacity k): every estimate is an
  * UNDERCOUNT with `true - n/(k+1) <= est <= true`, and any item with
  * `true > n/(k+1)` is guaranteed present in the summary — both
  * spec-pinned (HeavyHittersSpec) including across merges. Tail entries
  * near the error bound are partition-order dependent (inherent to any
  * mergeable frequency sketch); consumers must read the head, which is
  * why the declared query keeps the top slice only — the same rows-only
  * discipline as the HLL and xxhash ops.
  *
  * Buffer is a plain open-hash map (String -> Long) serialized as
  * (count, [UTF, long]*); eval emits the summary sorted (est DESC, item
  * ASC) as array<struct<token, est_count>> for deterministic downstream
  * explode.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "capacity k must be positive")

  override def prettyName: String = "misra_gries_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val c = buf.get(item) // 0L when absent (unboxed map default)
      if (c > 0L || buf.containsKey(item)) buf.put(item, c + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else {
        // classic MG decrement-all: every decrement retires one earlier
        // increment, so the O(k) walk amortizes to O(1) per input item
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = buf.get(e.getKey)
      buf.put(e.getKey, c + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything (the PODS'12
      // mergeable-MG trim), drop the non-positive remainder
      val vals = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2)
        if (byCount != 0) byCount else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column wrapper: aggregate a string column into the top-`k` summary. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MisraGries(ColumnBridge.expression(c), k)
      .toAggregateExpression())
}
