package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SURVEY §2 H3: imperative sketch aggregation via the internal
  * `TypedImperativeAggregate` API — the extension tier for aggregates whose
  * state is an opaque blob rather than a fixed-width row.
  *
  * A classic HyperLogLog: 2^p byte registers, XxHash64 over the input value,
  * register index from the top p bits, rank = leading zeros of the rest.
  * `serialize`/`deserialize` ARE the register array, so the map-side partial
  * that crosses the shuffle is exactly 2^p bytes per group regardless of
  * input cardinality — the property that makes a sketch the right call at
  * 100 TB where COUNT(DISTINCT)'s exact two-phase expansion shuffles every
  * distinct value. Merge is a register-wise max: associative, commutative,
  * merge-order independent by construction.
  *
  * p = 14 → 16 KiB state, theoretical rsd 1.04/sqrt(2^14) ≈ 0.81%
  * (PropertySpec asserts observed error vs exact within tolerance).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def prettyName: String = "hll_approx"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  // core shared with the mergeable-sketch-column functions (HllSketch.scala)
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v, child.dataType, p)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = Hll.estimate(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

object HllSketchAgg {
  /** Make `hll_approx(x)` callable from SQL/expr in this session (the
    * analyzer wraps a bare AggregateFunction in an AggregateExpression). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_approx", exprs => HllSketchAgg(exprs.head), "built-in")
}
