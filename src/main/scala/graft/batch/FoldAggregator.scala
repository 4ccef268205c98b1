package graft.batch

import graft.fold.FoldOption
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bridge from the fold algebra to a Spark typed [[Aggregator]] so a fold
  * runs as `ds.groupByKey(...).agg(...)` with map-side partial aggregation
  * (reference build plan SURVEY.md §7.1 step 3).
  *
  * Only valid for order-insensitive folds: `merge` must be associative and
  * commutative and agree with folding element-wise. Order-sensitive folds
  * must use [[OrderedFold]] instead — Spark decides partial-aggregation
  * order, so there is no way to honor offset order through an Aggregator.
  */
final class FoldAggregator[A, S](
    fold: FoldOption[S, A],
    mergeS: (S, S) => S)(implicit sEnc: Encoder[Option[S]])
  extends Aggregator[A, Option[S], Option[S]] {

  override def zero: Option[S] = None
  override def reduce(b: Option[S], a: A): Option[S] = fold.run(b, a)
  override def merge(b1: Option[S], b2: Option[S]): Option[S] = (b1, b2) match {
    case (Some(x), Some(y)) => Some(mergeS(x, y))
    case _ => b1.orElse(b2)
  }
  override def finish(reduction: Option[S]): Option[S] = reduction
  override def bufferEncoder: Encoder[Option[S]] = sEnc
  override def outputEncoder: Encoder[Option[S]] = sEnc
}

object FoldAggregator {
  import scala.reflect.runtime.universe.TypeTag
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  /** Encoder for Option-wrapped state (nullable column). */
  def optionEncoder[T: TypeTag]: Encoder[Option[T]] = ExpressionEncoder[Option[T]]()

  def apply[A, S: TypeTag](fold: FoldOption[S, A])(mergeS: (S, S) => S): FoldAggregator[A, S] =
    new FoldAggregator[A, S](fold, mergeS)(optionEncoder[S])
}
