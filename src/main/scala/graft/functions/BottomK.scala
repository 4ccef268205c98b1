package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Exact bottom-k by a long sort key, as a mergeable native aggregate —
  * the bounded "argmin-k" every deterministic sampler needs: feed it
  * `xxhash64(id)` as the key and the k smallest hashes ARE a uniform,
  * reproducible, merge-order-independent sample of the group (bottom-k
  * sketch / KMV, Bar-Yossef et al. 2002).
  *
  * Why it exists: the window alternative (`row_number over (partition by
  * g order by hash)`) shuffles and sorts the WHOLE corpus to keep k rows
  * per group; this aggregate keeps k (key, payload) pairs per partial and
  * ships O(k) per partition — the sample never costs more than the scan.
  * Unlike the sketches (MisraGries, KllQuantiles) the result is EXACT and
  * partitioning-independent: bottom-k of a multiset is associative.
  *
  * eval emits array<struct<sort_key:long, id:long>> ascending by
  * (sort_key, id). Ties beyond k are broken by the payload (smaller id
  * wins) so the result is a total-order prefix — deterministic even with
  * duplicate keys.
  */
final class BottomKBuffer(val k: Int) {
  // parallel arrays, sorted asc by (key, id); size <= k
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  private def lessThan(key: Long, id: Long, i: Int): Boolean =
    key < keys(i) || (key == keys(i) && id < ids(i))

  def add(key: Long, id: Long): Unit = {
    if (size == k && !lessThan(key, id, size - 1)) return
    // binary search for insertion point in the sorted prefix
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lessThan(key, id, mid)) hi = mid else lo = mid + 1
    }
    val insert = lo
    val newSize = math.min(size + 1, k)
    var i = newSize - 1
    while (i > insert) { keys(i) = keys(i - 1); ids(i) = ids(i - 1); i -= 1 }
    keys(insert) = key
    ids(insert) = id
    size = newSize
  }

  def mergeIn(other: BottomKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.keys(i), other.ids(i)); i += 1 }
  }
}

case class BottomKByKey(
    left: Expression,  // long sort key
    right: Expression, // long payload id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "bottom_k_by_key"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sort_key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val key = left.eval(input)
    val id = right.eval(input)
    if (key != null && id != null)
      buf.add(key.asInstanceOf[Long], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(Array[Any](buf.keys(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.keys(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BottomKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.keys(i) = in.readLong(); buf.ids(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKByKey =
    copy(left = newLeft, right = newRight)
}

object BottomKByKey {
  /** Column wrapper: keep the k smallest (sortKey, id) pairs. */
  def apply(sortKey: Column, id: Column, k: Int): Column =
    ColumnBridge.column(BottomKByKey(
      ColumnBridge.expression(sortKey), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
