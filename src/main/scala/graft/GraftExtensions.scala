package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions so `spark.sql("... vec_dot(a, b) ...")` works in any
  * session built with `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("str_poly2"),
      new ExpressionInfo(classOf[graft.functions.DualPolyHash].getName, "str_poly2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DualPolyHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[graft.functions.SimHashAgg].getName, "simhash_fp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHashAgg(exprs(0), exprs(1))))
    // literal-int second arguments are folded at registration so SQL
    // callers write e.g. `freq_items(bucket, 1024)`; validated so a
    // wrong call fails with the function named, not a raw internal error
    def litInt(name: String,
        exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Int = {
      require(exprs.length == 2, s"$name expects 2 arguments (column, literal int)")
      val e = exprs(1)
      require(e.foldable, s"$name argument 2 must be a literal integer, got $e")
      e.eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$name argument 2 must be a literal integer, got $other")
      }
    }
    e.injectFunction((
      FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[graft.functions.FreqItemsAgg].getName, "freq_items"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.FreqItemsAgg(exprs(0), litInt("freq_items", exprs))))
    e.injectFunction((
      FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[graft.functions.VecSumAgg].getName, "vec_sum"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VecSumAgg(exprs(0), litInt("vec_sum", exprs))))
    // bounded-heap top/bottom-k: `topk(v, a, b, 3)` — k is a folded
    // literal, like the capacity arguments above
    def litK(name: String,
        exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Int = {
      require(exprs.length == 4, s"$name expects 4 arguments (v, a, b, literal k)")
      val e = exprs(3)
      require(e.foldable, s"$name argument 4 must be a literal integer, got $e")
      e.eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$name argument 4 must be a literal integer, got $other")
      }
    }
    e.injectFunction((
      FunctionIdentifier("topk"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TopKAgg(exprs(0), exprs(1), exprs(2), litK("topk", exprs))))
    e.injectFunction((
      FunctionIdentifier("bottomk"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "bottomk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TopKAgg(exprs(0), exprs(1), exprs(2),
          litK("bottomk", exprs), asc = true)))
  }
}
