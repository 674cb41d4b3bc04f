package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary over a long-keyed stream — the
  * mergeable heavy-hitters sketch (Agarwal et al., "Mergeable
  * Summaries", PODS'12) a pipeline uses for top-k values / hot-key
  * detection at 100 TB: O(capacity) state per group flows through
  * partial aggregation and the shuffle, never the full key histogram.
  *
  * Guarantees: every key with true count > n/(capacity+1) survives,
  * and each kept count undercounts by at most the total decrement.
  * With `capacity` ≥ the group's distinct-key count no decrement ever
  * fires and every count is EXACT — the same exact-at-test-scale
  * framing as the quantile sketch (B24): the DuckDB group-by oracle
  * gates the full pipeline, and at 100 TB the identical plan degrades
  * gracefully to ε-approximate.
  *
  * eval returns array<struct<k: long, n: long>> ordered (n desc,
  * k asc) — deterministic, so callers can take a stable top-k slice.
  */
case class FreqItemsAgg(
    keyExpr: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Long, Long]] {

  type Buf = scala.collection.mutable.HashMap[Long, Long]

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k", LongType), StructField("n", LongType))), containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  /** The MG decrement: drop every count by the smallest amount that
    * frees a slot (the classic step uses 1; decrementing by the min
    * count is the standard batched variant — same guarantees, fewer
    * passes).
    */
  private def shrinkTo(buf: Buf, cap: Int): Unit =
    while (buf.size > cap) {
      val m = buf.valuesIterator.min
      val dead = buf.iterator.collect { case (k, v) if v <= m => k }.toList
      dead.foreach(buf -= _)
      buf.keysIterator.toList.foreach(k => buf(k) = buf(k) - m)
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val k = keyExpr.eval(input)
    if (k != null) {
      val key = k.asInstanceOf[Long]
      buf.get(key) match {
        case Some(v) => buf(key) = v + 1
        case None =>
          buf(key) = 1L
          shrinkTo(buf, capacity)
      }
    }
    buf
  }

  override def merge(x: Buf, y: Buf): Buf = {
    y.foreach { case (k, v) => x(k) = x.getOrElse(k, 0L) + v }
    shrinkTo(x, capacity)
    x
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy { case (k, n) => (-n, k) }
    new GenericArrayData(sorted.map { case (k, n) => InternalRow(k, n) }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) { buf(in.readLong()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(keyExpr = c.head)
}
