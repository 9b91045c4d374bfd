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
  * Semantics match the HOF formulation bit-for-bit: float -> double widening
  * (exact), strict left-to-right double accumulation — identical to the
  * DuckDB oracle's sequential list_sum — and, when the array type admits
  * null elements, a null element poisons the result to NULL exactly like
  * the `zip_with`/`aggregate` fold. The input type check REQUIRES
  * ARRAY<FLOAT> on both sides: array<double>/array<int> arguments are an
  * analysis error, never a silent memory reinterpretation. Edge divergence
  * (documented, not fired by any declared query — embeddings are
  * fixed-dim): on MISMATCHED lengths the kernel truncates to the shorter
  * array where `zip_with` null-pads the longer one and yields NULL.
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

  /** Null-element-aware variants (used when containsNull): any null element
    * -> null result, matching the HOF fold's NULL poisoning. */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def normBoxed(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  private[functions] def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
}

case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_f requires two ARRAY<FLOAT> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private def boxed: Boolean =
    VectorKernels.elementsNullable(left.dataType) ||
      VectorKernels.elementsNullable(right.dataType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = super.nullable || boxed
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (boxed) VectorKernels.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!boxed)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
    else nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double r = graft.functions.VectorKernels.dotBoxed($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

case class NormF(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm_f requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  private def boxed: Boolean = VectorKernels.elementsNullable(child.dataType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = super.nullable || boxed
  override def prettyName: String = "graft_norm_f"

  override protected def nullSafeEval(input: Any): Any =
    if (boxed) VectorKernels.normBoxed(input.asInstanceOf[ArrayData])
    else VectorKernels.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!boxed)
      defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.norm($c)")
    else nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Double r = graft.functions.VectorKernels.normBoxed($c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormF =
    copy(child = newChild)
}
