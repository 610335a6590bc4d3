package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) heavy-hitters sketch as a custom
  * `TypedImperativeAggregate` — Spark has no bounded-memory top-k
  * frequency aggregate (`count + orderBy + limit` shuffles every
  * distinct key; this holds at most `capacity` counters per partial
  * aggregate and merges like any other agg buffer).
  *
  * Guarantee: any item with true frequency > n/capacity is present in
  * the sketch, and each reported count overestimates by at most the
  * smallest displaced counter (tracked as the error term).
  *
  * Returned as map(item → estimated count); callers take the top-k
  * entries. Exactness: when distinct items ≤ capacity the counts are
  * exact — HeavyHittersSpec exploits that to check against groupBy.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  /** (count, error) per tracked item. */
  private def offer(buf: mutable.LinkedHashMap[String, (Long, Long)],
      item: String, add: Long, addErr: Long): Unit = {
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + add, e + addErr))
      case None if buf.size < capacity => buf.update(item, (add, addErr))
      case None =>
        // displace the minimum counter (SpaceSaving step)
        val (minItem, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(minItem)
        buf.update(item, (minC + add, minC + addErr))
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.LinkedHashMap[String, (Long, Long)],
      other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    other.foreach { case (item, (c, e)) => offer(buf, item, c, e) }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val entries = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2._1).toArray[Any]))
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Registers `heavy_hitters(col, capacity)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => HeavyHitters(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "built-in")

  def heavy_hitters(c: Column, capacity: Int): Column =
    call_function("heavy_hitters", c, org.apache.spark.sql.functions.lit(capacity))
}
