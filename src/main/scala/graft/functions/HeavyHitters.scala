package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch over a string column: at most `capacity`
  * counters; every key with true frequency > n/(capacity+1) is guaranteed
  * present, counts undercount by at most n/(capacity+1). With capacity >=
  * |distinct keys| the sketch is EXACT (no decrements ever fire) — the
  * configuration the oracle checks; at 100 TB the point is the fixed memory
  * bound: counter state is O(capacity) per group regardless of input size,
  * and merge (counter-wise add, then global decrement) keeps partial
  * aggregation correct.
  */
case class HeavyHitters(
    capacity: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  /** Decrement all counters by the minimum excess until <= capacity remain. */
  private def shrink(m: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    while (m.size > capacity) {
      val dec = m.valuesIterator.min
      val dead = m.collect { case (k, v) if v <= dec => k }
      m.mapValuesInPlace((_, v) => v - dec)
      dead.foreach(m.remove)
    }
    m
  }

  override def update(m: mutable.LinkedHashMap[String, Long], input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      m.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
      if (m.size > capacity) shrink(m)
    }
    m
  }

  override def merge(a: mutable.LinkedHashMap[String, Long], b: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    b.foreach { case (k, v) => a.updateWith(k)(c => Some(c.getOrElse(0L) + v)) }
    shrink(a)
  }

  /** map<string, long> of surviving counters. */
  override def eval(m: mutable.LinkedHashMap[String, Long]): Any = {
    val sorted = m.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(kv => UTF8String.fromString(kv._1): Any).toArray),
      new GenericArrayData(sorted.map(_._2: Any).toArray))
  }

  override def serialize(m: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(m.size)
    m.foreach { case (k, v) => dos.writeUTF(k); dos.writeLong(v) }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHitters =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column API: Misra-Gries sketch of `col` with `capacity` counters. */
  def heavy_hitters(capacity: Int, c: Column): Column =
    ColumnBridge.column(
      HeavyHitters(capacity, ColumnBridge.expression(c)).toAggregateExpression())
}
