package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** All-in-one SimHash fingerprint aggregate: for a group's stream of
  * (word hash, count) pairs, maintains the 64 signed bit counters in
  * ONE primitive long[] buffer and packs the fingerprint (bit i set
  * iff counter i > 0) at eval — one aggregate column instead of 64
  * separate conditional sum() aggregates plus a 64-term packing
  * projection. Counters are exact integers, so the result is
  * bit-identical to the column formulation at any parallelism (long
  * addition commutes).
  */
case class SimHashAgg(
    hash: Expression,
    cnt: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash, cnt)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    val c = cnt.eval(input)
    if (h != null && c != null) {
      val hv = h.asInstanceOf[Long]
      val cv = c.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((hv >>> i) & 1L) == 1L) buf(i) += cv else buf(i) -= cv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hash = c(0), cnt = c(1))
}
