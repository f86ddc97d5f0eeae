package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate over struct rows: keeps the k smallest structs
  * (lexicographic field order — encode "top" as ascending sort keys, e.g.
  * a negated score first) per group in a size-capped buffer.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` idiom: a
  * window must shuffle and fully sort EVERY row of every group, while this
  * aggregate partially aggregates map-side — at most k rows per group per
  * map partition cross the exchange, and merge is a k-bounded merge. At
  * 100 TB the window's sort is the bottleneck; this is a narrow combine.
  *
  * Buffer strategy: append rows; past 4k entries, sort in place and trim to
  * k (amortized O(n log k / k) comparisons per row).
  */
case class TopKStruct(
    k: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k > 0, "k must be positive")
  // resolved only after analysis — must not be touched at construction
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    PhysicalDataType.ordering(child.dataType).asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] = ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > k) {
      val kept = buf.sortInPlace()(ordering).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += proj(v.asInstanceOf[InternalRow]).copy()
      if (buf.length >= 4 * k) trim(buf)
    }
    buf
  }

  override def merge(a: ArrayBuffer[InternalRow], b: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] =
    trim(a ++= b)

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(trim(buf).sortInPlace()(ordering).toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.length)
    buf.foreach { row =>
      val u = row.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKStruct =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKStruct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStruct =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_struct"
}

object TopKStruct {
  /** Column API: smallest-k structs of `ordered` per group, ascending. */
  def topk_struct(k: Int, ordered: Column): Column =
    ColumnBridge.column(
      TopKStruct(k, ColumnBridge.expression(ordered)).toAggregateExpression())
}
