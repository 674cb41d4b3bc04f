package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k per group: keeps the k best (value DESC — or ASC with
  * `asc = true`, the bottomk half — then label ascending for
  * deterministic ties) entries in a tiny sorted buffer.
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY v DESC)` + filter) sorts every group's full row set; this
  * aggregate carries at most k entries per group through partial
  * aggregation and the shuffle — O(n log k) work and O(k) state, the
  * shape that survives a billion-series group at 100 TB.
  *
  * Rows are (v: double, a: string, b: string); eval returns
  * array<struct<v, a, b>> best-first.
  */
case class TopKAgg(
    vExpr: Expression, aExpr: Expression, bExpr: Expression, k: Int,
    asc: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, UTF8String, UTF8String)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, UTF8String, UTF8String)]

  override def children: Seq[Expression] = Seq(vExpr, aExpr, bExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType), StructField("a", StringType),
    StructField("b", StringType))), containsNull = false)

  /** (v desc|asc, a asc, b asc): true if x ranks strictly better than y. */
  private def better(x: (Double, UTF8String, UTF8String),
      y: (Double, UTF8String, UTF8String)): Boolean = {
    if (x._1 != y._1) { if (asc) x._1 < y._1 else x._1 > y._1 }
    else {
      val ca = x._2.compareTo(y._2)
      if (ca != 0) ca < 0 else x._3.compareTo(y._3) < 0
    }
  }

  private def insert(buf: Buf, e: (Double, UTF8String, UTF8String)): Buf = {
    if (buf.length < k || better(e, buf.last)) {
      var i = buf.length
      buf += e
      while (i > 0 && better(buf(i), buf(i - 1))) {
        val t = buf(i); buf(i) = buf(i - 1); buf(i - 1) = t
        i -= 1
      }
      if (buf.length > k) buf.remove(buf.length - 1)
    }
    buf
  }

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = vExpr.eval(input)
    val a = aExpr.eval(input)
    val b = bExpr.eval(input)
    if (v != null && a != null && b != null)
      insert(buf, (v.asInstanceOf[Double],
        a.asInstanceOf[UTF8String].clone(), b.asInstanceOf[UTF8String].clone()))
    else buf
  }

  override def merge(x: Buf, y: Buf): Buf = {
    y.foreach(insert(x, _))
    x
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map { case (v, a, b) =>
      InternalRow(v, a, b)
    }.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, a, b) =>
      out.writeDouble(v)
      val ab = a.getBytes; out.writeInt(ab.length); out.write(ab)
      val bb = b.getBytes; out.writeInt(bb.length); out.write(bb)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) {
      val v = in.readDouble()
      val la = in.readInt(); val ab = new Array[Byte](la); in.readFully(ab)
      val lb = in.readInt(); val bb = new Array[Byte](lb); in.readFully(bb)
      buf += ((v, UTF8String.fromBytes(ab), UTF8String.fromBytes(bb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vExpr = c(0), aExpr = c(1), bExpr = c(2))
}

object TopKAgg {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.{call_function, lit}

  /** Column-API access to the bounded-heap aggregate for every caller
    * (batch B6, streaming H12). ONE fixed-name idempotent registration
    * per direction — k travels as a literal ARGUMENT, mirroring the
    * SQL surface in GraftExtensions — so a query builder calling this
    * repeatedly (or with many k values) re-binds the identical
    * definition instead of leaking per-k registrations, which is the
    * same deliberate pattern as [[VecFunctions.register]] (the public
    * alternative to Column's private[sql] constructor).
    */
  def column(spark: SparkSession, v: Column, a: Column, b: Column,
      k: Int, asc: Boolean = false): Column = {
    val fn = if (asc) "graft_bottomk" else "graft_topk"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn,
      exprs => {
        require(exprs(3).foldable, s"$fn k must be a literal")
        TopKAgg(exprs(0), exprs(1), exprs(2),
          exprs(3).eval().asInstanceOf[Number].intValue(), asc)
      },
      "built-in")
    call_function(fn, v, a, b, lit(k))
  }
}
