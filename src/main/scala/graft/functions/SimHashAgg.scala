package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash as a single `TypedImperativeAggregate` — the same
  * fixed-width-sketch pattern as [[MinHashSketchAgg]]. Per group the state
  * is 64 int counters; each input token hash adds ±1 to counter k according
  * to bit k of the hash; eval packs `counter > 0` into bit k of one long.
  *
  * Replaces a 64-column `sum(when(...))` aggregate whose per-column
  * update overhead (64 generated sum slots touched per row) made the
  * aggregation the dominant stage of the SimHash pipeline (measured
  * 2.5s/32 tasks at sf0.1 — ~5s total vs ~1s with the sketch). Identical
  * bits to the column formulation: sum of ±1 > 0 ⇔ counter > 0.
  *
  * Input: non-null LONG token hashes (xxhash64). Output: LONG simhash.
  */
case class SimHashSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sketch"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) buf(k) += 1 else buf(k) -= 1
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var k = 0
    while (k < 64) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var k = 0
    while (k < 64) { if (buf(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSketchAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** `simhash_sketch(hashCol)` as a Column aggregate. */
  def simhash_sketch(hashCol: Column): Column =
    ColumnBridge.column(
      SimHashSketchAgg(ColumnBridge.expression(hashCol)).toAggregateExpression())
}
