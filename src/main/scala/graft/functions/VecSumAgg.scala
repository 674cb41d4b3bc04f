package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum over array<float|double> columns — the
  * centroid-building aggregate of embedding pipelines. One primitive
  * double[dim] buffer per group flows through partial aggregation and
  * the shuffle (vs exploding N×dim rows and re-assembling with a
  * per-dimension groupBy: a dim× larger shuffle and a second exchange).
  * Callers divide by the count themselves — or skip it entirely where
  * only the direction matters (cosine to centroid is scale-invariant).
  */
case class VecSumAgg(
    child: Expression, dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = child.eval(input)
    if (a != null) {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      val f = isFloat
      var i = 0
      while (i < n) {
        buf(i) += (if (f) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
    }
    buf
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(dim * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
