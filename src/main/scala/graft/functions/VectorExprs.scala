package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels over `array<float>` embeddings —
  * replacing the interpreted `aggregate(zip_with(...))` /
  * `aggregate(transform(...))` folds in VectorOps (same 100x-class win as
  * [[SimHash64]]; HOF lambdas evaluate interpreted per element).
  *
  * Semantics match the HOF formulation bit-for-bit on equal-length inputs:
  * float -> double widening (exact) and a strict left-to-right double
  * accumulation — identical to the DuckDB oracle's sequential list_sum,
  * keeping the hash-compare gate valid. Edge divergence: on MISMATCHED
  * lengths the kernel truncates to the shorter array, where `zip_with`
  * would null-pad the longer one and poison the fold to NULL — embeddings
  * are fixed-dim so this never fires in the declared queries.
  *
  * Registered as `graft_dot_f(a, b)` and `graft_norm_f(a)` by
  * [[graft.plans.GraftExtensions]].
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(FloatType) && right.dataType == ArrayType(FloatType))
      TypeCheckResult.TypeCheckSuccess
    else if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckSuccess // nullable-element array<float> variants
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_f requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

case class NormF(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_norm_f requires an ARRAY<FLOAT> argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm_f"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormF =
    copy(child = newChild)
}
