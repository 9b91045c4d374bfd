package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the 60-bit SimHash of a
  * whitespace-tokenized text column — the codegen'd replacement for the
  * nested `transform/aggregate` higher-order-function tree in
  * TextOps.simhashDF (HOFs evaluate interpreted; this stays inside
  * whole-stage codegen via a static call and hashes each token once instead
  * of once per bit).
  *
  * Scheme (bit-identical to the HOF formulation, so either path yields the
  * same signatures): token hash = first 15 hex chars of md5(token) = the
  * high 60 bits of the digest's first 8 bytes; signature bit j is set when
  * the sum over tokens of (bit_j(hash)*2 - 1) is positive; bits fold
  * most-significant-first for ascending j (acc*2 + b).
  *
  * Registered as SQL function `graft_simhash64` by [[graft.plans.GraftExtensions]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    // Spark's split(text, ' ') keeps empty tokens (regex split, limit -1)
    val tokens = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    val md = digest.get()
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val d = md.digest(tokens(t).getBytes("UTF-8"))
      // first 15 hex chars == high 60 bits of the first 8 digest bytes
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 1
    }
    // fold ascending j with acc*2 + bit (j=0 ends up most significant)
    var acc = 0L
    var j = 0
    while (j < 60) {
      acc = acc * 2L + (if (votes(j) > 0) 1L else 0L)
      j += 1
    }
    acc
  }
}
