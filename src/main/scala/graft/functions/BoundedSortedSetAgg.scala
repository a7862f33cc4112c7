package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic bounded collect_set (the SURVEY §7 candidate): keeps
  * the `bound` SMALLEST distinct string values per group, returned
  * sorted.
  *
  * Two properties `collect_set` lacks at 100 TB:
  *  - bounded state: a pathological group (one variant observed in every
  *    sample, one user with 10⁹ events) cannot blow up executor memory —
  *    the buffer never exceeds `bound` entries, including during partial
  *    (map-side) aggregation;
  *  - deterministic content AND order: min-N is a commutative,
  *    associative fold, so partition order can't change the result.
  */
case class BoundedSortedSetAgg(bound: Int)
    extends Aggregator[String, TreeSet[String], Seq[String]] {
  require(bound > 0)

  override def zero: TreeSet[String] = TreeSet.empty[String]

  private def cap(s: TreeSet[String]): TreeSet[String] =
    if (s.size > bound) s.take(bound) else s

  override def reduce(buf: TreeSet[String], in: String): TreeSet[String] =
    if (in == null) buf else cap(buf + in)

  override def merge(a: TreeSet[String], b: TreeSet[String]): TreeSet[String] =
    cap(a ++ b)

  override def finish(r: TreeSet[String]): Seq[String] = r.toSeq

  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object BoundedSortedSetAgg {
  /** SQL registration: `bounded_set_<bound>(col)`. */
  def register(spark: SparkSession, bound: Int): String = {
    val name = s"bounded_set_$bound"
    spark.udf.register(name, udaf(BoundedSortedSetAgg(bound)))
    name
  }
}
