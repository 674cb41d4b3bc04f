package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native dot product over array<float>/array<double> columns with
  * whole-stage codegen — the hot inner loop of every embedding
  * operator (cosine dedup, ANN re-rank, LSH signatures).
  *
  * Why not `aggregate(zip_with(a, b, _*_), ...)`: higher-order
  * functions are interpreted (no doGenCode), allocate an intermediate
  * array per row, and break the surrounding WholeStageCodegen span.
  * This expression is a tight primitive loop accumulating in double
  * (float inputs are widened exactly, so results match an oracle that
  * casts to double first).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
    val rGet = if (elemType(right).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All random-hyperplane LSH bucket ids of a vector in ONE codegen
  * pass: element t of the result packs `bits` sign bits of
  * dot(v, plane[t*bits + b]).
  *
  * Why not `bits × tables` vec_dot columns with `typedlit` planes: each
  * plane becomes dim literals in the projection's generated source —
  * 16 tables × 8 bits × 64 dims ≈ 8k constants — which bloats codegen
  * past JIT-friendly sizes and gets fully re-evaluated on every
  * reference (both sides of a candidate self-join). Here the plane
  * matrix rides along as ONE flat double[] reference object and the
  * whole signature is a tight triple loop.
  */
case class LshBuckets(child: Expression, planes: Array[Array[Double]],
    tables: Int, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.length == tables * bits, "planes must be tables*bits rows")
  private val dim = planes.headOption.map(_.length).getOrElse(0)
  // flattened row-major: plane p's coords at [p*dim, (p+1)*dim)
  private lazy val flat: Array[Double] = planes.flatten

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_buckets expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val f = isFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) * flat(off + i)
          i += 1
        }
        if (acc >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = ($t * $bits + $b) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $v.$get($i)) * $planesRef[$off + $i];
         |    }
         |    if ($acc >= 0) $bucket |= (1 << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VecFunctions {
  /** Idempotent per-session registration; gives Column-API access via
    * call_function without depending on Column's private constructor.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")

  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
