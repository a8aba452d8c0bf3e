package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k aggregate: the k smallest (distance, id)
  * pairs per group, ascending.
  *
  * This is the reference's per-shard `partial_sort` top-k
  * (`src/index/shard_manager.cc:129-145`) lifted into a first-class
  * Catalyst aggregate. Compared to the window-function form
  * (`row_number() OVER (PARTITION BY g ORDER BY d)` + filter), which
  * SORTS EVERY ROW of every group, this keeps a k-bounded heap and —
  * because it is a proper aggregate — participates in partial/final
  * aggregation: each map task reduces its slice of a group to ≤ k pairs
  * BEFORE the shuffle. At 100 TB that's the difference between shuffling
  * the table and shuffling `groups × k` rows.
  *
  * Determinism: (distance, id) lexicographic order, matching the
  * engine-wide tie-break convention (SURVEY.md §5.1).
  */
case class BottomK(
    distance: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "bottom_k requires k > 0")

  override def children: Seq[Expression] = Seq(distance, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("distance", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  // max-heap on (distance, id): head = current worst of the kept k
  private val ord: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val d = distance.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      val pair = (d.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { pair =>
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (d, i) =>
      new GenericInternalRow(Array[Any](d, i))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomK =
    copy(distance = newChildren(0), id = newChildren(1))
}

object BottomK {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `bottom_k(distance, id, k)` → ARRAY<STRUCT<distance,id>>
    * ascending. */
  def bottomK(distance: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(distance), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
