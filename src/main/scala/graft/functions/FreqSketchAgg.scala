package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a `TypedImperativeAggregate`: at
  * most `k` (term → lower-bound count) counters per buffer, O(k) state
  * regardless of stream length or key cardinality.
  *
  * Guarantee (Misra–Gries 1982; merge form Agarwal et al., PODS'12): after
  * summarizing N items, every term with true count > N/(k+1) HAS a counter,
  * and each counter undercounts by at most N/(k+1). Mergeable: partial
  * buffers combine by counter addition followed by a rank-(k+1) subtraction,
  * preserving the same bound — which is what makes this a valid Spark
  * aggregate (map-side partials, arbitrary merge order).
  *
  * The COUNTER VALUES depend on stream/merge order (only the guarantee is
  * order-free), so queries must treat the sketch as a CANDIDATE SET and
  * re-count candidates exactly (q106's two-pass shape) — never emit raw
  * sketch counts where layout independence matters.
  */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.toString
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < k => buf.update(term, 1L)
        case None =>
          // classic MG: a miss at capacity decrements every counter
          val dead = buf.iterator.flatMap { case (t, c) =>
            if (c == 1L) Some(t) else { buf.update(t, c - 1); None }
          }.toList
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all, drop the non-positive
      val m = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.iterator.flatMap { case (t, c) =>
        if (c - m <= 0L) Some(t) else { a.update(t, c - m); None }
      }.toList
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    // sorted keys: stable output for a given buffer content
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** `freq_sketch(term, k)` as a Column aggregate → map<string,bigint>. */
  def freq_sketch(term: Column, k: Int): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(term), k).toAggregateExpression())
}
