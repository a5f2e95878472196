package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature as a single `TypedImperativeAggregate` (the custom-agg
  * extension point from the build brief: mutable fixed-width sketch buffer,
  * like HLL). One pass, one 64×8-byte buffer per group, elementwise-min
  * merge — replaces 64 separate `min(pmod(...))` aggregate columns, whose
  * per-column update/codegen overhead dominated the signature stage.
  *
  * Input: a non-null LONG column of shingle hashes in [0, p).
  * Output: array<bigint> of length `params.size` — identical values to the
  * 64-column formulation (h_i(x) = (a_i·x + b_i) mod p, minimized).
  */
case class MinHashSketchAgg(
    child: Expression,
    params: Seq[(Long, Long)],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray
  private val n = params.size

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        // a < 2^31, h < p < 2^31 → a*h < 2^62: no overflow
        val x = (as(i) * h + bs(i)) % prime
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** `minhash_sketch(hashCol)` as a Column aggregate. */
  def minhash_sketch(hashCol: Column, params: Seq[(Long, Long)], prime: Long): Column =
    ColumnBridge.column(
      MinHashSketchAgg(ColumnBridge.expression(hashCol), params, prime)
        .toAggregateExpression())
}
