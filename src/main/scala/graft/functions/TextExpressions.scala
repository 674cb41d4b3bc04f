package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The dual polynomial token hash of the simhash pipeline
  * (h1 = fold 131/1e9+7, h2 = fold 137/998244353, packed as
  * h1·2^31 + h2) in ONE codegen byte loop.
  *
  * Why not `aggregate(transform(split(word, ''), ascii), ...)` twice:
  * higher-order functions are interpreted, and that formulation first
  * materializes a per-character array of single-char strings, then an
  * array of longs, then folds it — per word, twice. This expression
  * walks the UTF8String's bytes in place, no allocation, inside
  * whole-stage codegen.
  *
  * Parity contract: the DuckDB oracle folds `ascii(ch)` per CHARACTER;
  * the byte walk equals that exactly when every char is single-byte —
  * the same documented ASCII corpus contract as
  * [[graft.multimodal.Multimodal.mediaTable]] (spec-pinned in
  * PipelineSpec). Both moduli are < 2^30, so h1·2^31 + h2 < 2^61:
  * ANSI-overflow-safe, top bits constant zero.
  */
case class DualPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"str_poly2 expects string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    DualPolyHash.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DualPolyHash.hash($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The 60-bit blockhash payload fingerprint of the G5 phash dedup in
  * ONE codegen byte loop: bit j is the exact integer sign test
  * `blocksum_j * n > tot * blocklen_j` over block j's byte range
  * [(j·n) div 60 + 1, ((j+1)·n) div 60] (1-based, the same floor
  * boundaries as the HOF/oracle formulation — blocks partition the
  * payload, so the whole fingerprint is O(n) + 60 boundary
  * computations, no per-char array allocation).
  *
  * Parity contract: byte walk ≡ the oracle's per-character ascii()
  * fold under the documented ASCII corpus contract (same as
  * [[DualPolyHash]]).
  */
case class BlockHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"blockhash60 expects string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    BlockHash.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.BlockHash.hash($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BlockHash {
  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length.toLong
    var tot = 0L
    var i = 0
    while (i < b.length) { tot += (b(i) & 0xff).toLong; i += 1 }
    var fp = 0L
    var j = 0
    while (j < 60) {
      val st = (j * n / 60).toInt + 1
      val en = ((j + 1) * n / 60).toInt
      var bs = 0L
      var p = st
      while (p <= en) { bs += (b(p - 1) & 0xff).toLong; p += 1 }
      val len = (en - st + 1).toLong
      if (bs * n > tot * len) fp |= 1L << (59 - j)
      j += 1
    }
    fp
  }

  /** Idempotent fixed-name registration + Column access. */
  def column(spark: SparkSession, s: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blockhash60", exprs => BlockHash(exprs.head), "built-in")
    call_function("blockhash60", s)
  }
}

object DualPolyHash {
  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < b.length) {
      val c = (b(i) & 0xff).toLong
      h1 = (h1 * 131L + c) % 1000000007L
      h2 = (h2 * 137L + c) % 998244353L
      i += 1
    }
    h1 * 2147483648L + h2
  }

  /** Idempotent fixed-name registration + Column access, the
    * [[VecFunctions.register]] pattern.
    */
  def column(spark: SparkSession, s: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "str_poly2", exprs => DualPolyHash(exprs.head), "built-in")
    call_function("str_poly2", s)
  }
}

/** Unicode NFC normalization as a codegen expression — the canonical
  * first step of a web-scale text-cleaning pipeline (ftfy/CCNet run it
  * before everything else): combining sequences compose to one code
  * point (e + U+0301 → é), so downstream hashing, shingling and dedup
  * see a single byte form per grapheme. java.text.Normalizer
  * implements the same Unicode normalization algorithm the oracle's
  * nfc_normalize() does, so NFC output is oracle-exact; no Spark
  * built-in exposes normalization.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc expects string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.norm(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.norm($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. The quick-check
    * fast path skips the allocation for the (overwhelming) majority of
    * already-normalized text — at corpus scale NFC is a no-op scan.
    */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Idempotent fixed-name registration + Column access, the
    * [[VecFunctions.register]] pattern.
    */
  def column(spark: SparkSession, s: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    call_function("graft_nfc", s)
  }
}
