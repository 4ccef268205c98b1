package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query into a serialized Count–Min sketch (Cormode & Muthukrishnan
  * 2005) produced by Spark's built-in `count_min_sketch(...)` aggregate —
  * the missing read side of the built-in: Spark can BUILD the sketch
  * (mergeable binary, fixed seed → fully deterministic, since counter adds
  * and merges are commutative elementwise sums) but ships no expression to
  * probe it.
  *
  * `cms_probe(sketch, item)` returns the estimated count of `item`: always
  * an OVERCOUNT with `true <= est <= true + eps*n` w.p. `confidence` — the
  * mirror guarantee of [[MisraGries]] (always an undercount), so probing
  * both brackets the true frequency from a 100 TB stream in one pass of
  * each with O(1/eps) state.
  *
  * Deserialization is cached per sketch REFERENCE (thread-local, last-used)
  * so the usual shape — one broadcast 1-row sketch probed by a head of
  * candidate terms — deserializes once per task, not once per row.
  */
case class CmsProbe(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_probe"

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    CmsProbe.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, it) => s"graft.functions.CmsProbe.estimate($sk, $it)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CmsProbe {
  def apply(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsProbe(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))

  // last-deserialized cache: the broadcast sketch bytes arrive as the SAME
  // array reference for every row in a task, so reference equality is the
  // correct (and cheapest) key; a miss costs one readFrom.
  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], item: UTF8String): Long = {
    val cached = last.get()
    val cms =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val d = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        last.set((bytes, d))
        d
      }
    // the built-in aggregate adds strings as their UTF-8 BYTES (BinaryType
    // path); probe with the same representation
    cms.estimateCount(item.getBytes)
  }
}
