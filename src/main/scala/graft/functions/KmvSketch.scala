package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** K-minimum-values (KMV / bottom-k) distinct sketch over pre-hashed LONG
  * values (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007): keep the k
  * smallest DISTINCT hashes by UNSIGNED order. Duplicates collapse by
  * construction, partials merge associatively (union = k smallest of the
  * concatenation), and — unlike HLL — two sketches support SET ALGEBRA:
  * the k smallest of A∪B are a uniform sample of the union, so the
  * fraction of them present in both sides estimates Jaccard, and
  * |A∩B| ≈ J·|A∪B|.
  *
  * Why it exists: the exact overlap matrix (`q_source_overlap`) must
  * DISTINCT the (group, token) population and self-join it — two
  * corpus-sized shuffles. The sketch path ships one O(k) partial per
  * partition per group and the pairwise estimates read 2k longs — at
  * 100 TB the difference between a join you schedule and a report you
  * read. Hash-based, so the declared query is rows-only; the guarantees
  * are spec-pinned (KmvSketchSpec): exact below capacity, merge
  * determinism across partitionings, bounded error above capacity.
  *
  * eval emits the sketch as a sorted (unsigned ascending) array<long> of
  * size min(k, observed distinct); read it with [[KmvJaccardPpm]] /
  * [[KmvDistinctEstimate]].
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
    def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  })

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (java.lang.Long.compareUnsigned(v, set.last()) < 0) {
      if (set.add(v)) set.pollLast()
      ()
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  require(k >= 8, "sketch capacity k must be >= 8")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Column wrapper: KMV sketch of a pre-hashed long column at capacity k. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(KmvSketch(ColumnBridge.expression(c), k)
      .toAggregateExpression())
}

/** Jaccard estimate in ppm from two KMV sketches (capacity k): one merge
  * pass takes the k unsigned-smallest of the union and counts how many sit
  * in BOTH sketches — `floor(common · 1e6 / taken)`. Exact when both sides
  * are below capacity (the sketches ARE the sets). Empty union → 0.
  * Codegen'd: the pairwise overlap grid evaluates inside whole-stage
  * codegen with zero per-row allocation.
  */
case class KmvJaccardPpm(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(k >= 8, "sketch capacity k must be >= 8")

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_jaccard_ppm"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var taken = 0
    var common = 0L
    while (taken < k && (i < n || j < m)) {
      if (j >= m || (i < n && java.lang.Long.compareUnsigned(x.getLong(i), y.getLong(j)) < 0)) i += 1
      else if (i >= n || java.lang.Long.compareUnsigned(y.getLong(j), x.getLong(i)) < 0) j += 1
      else { common += 1; i += 1; j += 1 }
      taken += 1
    }
    if (taken == 0) 0L else common * 1000000L / taken
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val taken = ctx.freshName("taken")
      val common = ctx.freshName("common")
      s"""
         |int $i = 0, $j = 0, $taken = 0;
         |long $common = 0L;
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |while ($taken < $k && ($i < $n || $j < $m)) {
         |  if ($j >= $m || ($i < $n &&
         |      Long.compareUnsigned($a.getLong($i), $b.getLong($j)) < 0)) { $i++; }
         |  else if ($i >= $n ||
         |      Long.compareUnsigned($b.getLong($j), $a.getLong($i)) < 0) { $j++; }
         |  else { $common++; $i++; $j++; }
         |  $taken++;
         |}
         |${ev.value} = $taken == 0 ? 0L : $common * 1000000L / $taken;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccardPpm =
    copy(left = newLeft, right = newRight)
}

object KmvJaccardPpm {
  def apply(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(KmvJaccardPpm(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}

/** Distinct-count estimate from a KMV sketch (capacity k): exact size
  * while below capacity; at capacity, `(k-1) / U_(k)` with the k-th
  * smallest hash read as an unsigned fraction of 2^64 (the classic KMV
  * estimator — unbiased, CV ≈ 1/sqrt(k-2)).
  */
case class KmvDistinctEstimate(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k >= 8, "sketch capacity k must be >= 8")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct_estimate"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n < k) n.toLong
    else {
      val kth = x.getLong(k - 1)
      val ud = if (kth >= 0) kth.toDouble else kth.toDouble + 1.8446744073709552E19
      ((k - 1).toDouble * (1.8446744073709552E19 / ud)).toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val kth = ctx.freshName("kth")
      val ud = ctx.freshName("ud")
      s"""
         |final int $n = $a.numElements();
         |if ($n < $k) { ${ev.value} = (long) $n; }
         |else {
         |  final long $kth = $a.getLong($k - 1);
         |  final double $ud = $kth >= 0 ? (double) $kth : (double) $kth + 1.8446744073709552E19;
         |  ${ev.value} = (long) (($k - 1) * (1.8446744073709552E19 / $ud));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KmvDistinctEstimate =
    copy(child = newChild)
}

object KmvDistinctEstimate {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(KmvDistinctEstimate(ColumnBridge.expression(c), k))
}
