package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Element-wise max over fixed-width byte arrays, as a PARTIAL-AGG-
  * capable aggregate — the merge operator of packed HyperLogLog
  * register banks (register max IS sketch union).
  *
  * Why an imperative aggregate and not the sparse (v, reg, rho)
  * groupBy-max: the sparse layout shuffles one row per (edge, register)
  * — ×64 the edge count in [[graft.graph.GraphOps.anfHll]]'s
  * propagation join, 768M rows/round at 12M edges — and a skewed
  * in-degree key (a 546K-degree hub) lands 35M of those rows on one
  * reducer. Packing the 64 registers into one BinaryType value makes
  * the shuffle row count equal the edge count, and because
  * TypedImperativeAggregate participates in partial aggregation, the
  * hub's incoming contributions COMBINE MAP-SIDE to one 64-byte row per
  * map task before they ever shuffle. Same skew absorption as integer
  * sums in `degrees`.
  *
  * Null/shape contract: null inputs are ignored (an all-null group
  * yields null); inputs must share one width — mixing widths throws
  * rather than silently truncating a register bank.
  */
case class BytewiseMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = null

  private def maxInto(acc: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (acc == null) in.clone()
    else {
      require(acc.length == in.length,
        s"bytewise_max: mixed widths ${acc.length} vs ${in.length}")
      var i = 0
      while (i < acc.length) {
        // registers are small positive values; compare as unsigned so a
        // hypothetical 128+ register still orders correctly
        if ((in(i) & 0xff) > (acc(i) & 0xff)) acc(i) = in(i)
        i += 1
      }
      acc
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else maxInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other == null) buffer else maxInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bytewise_max requires binary input, got ${t.simpleString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BytewiseMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BytewiseMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BytewiseMaxAgg =
    copy(child = newChild)
}

object HllRegAgg {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate Column: element-wise (unsigned) max of binary values. */
  def bytewiseMax(c: Column): Column =
    ColumnBridge.column(
      BytewiseMaxAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
