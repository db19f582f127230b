package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector column functions over `ArrayType(FloatType)` embeddings.
  * Every per-row hot loop ([[dot]], [[normSq]], [[euclidean]],
  * [[l2Normalize]]) is a compiled Catalyst expression: the HOF
  * formulations (`aggregate`/`zip_with`/`transform` lambdas) are
  * CodegenFallback — interpreted per row — which is exactly the hot-loop
  * class that made the round-3/4 dedup paths pathological at scale (the
  * dot product alone runs millions of times per micro-partition in
  * candidate verification). All kernels sum in double, ascending index
  * order, bit-identical to the HOFs they replaced; no UDF, no shuffle.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product as a compiled kernel. The HOF formulation
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` is CodegenFallback —
    * interpreted per row — and the dot product is THE hot loop of every
    * similarity path (candidate verification runs it millions of times
    * per micro-partition). Bit-identical to the HOF: same ascending-index
    * double summation.
    */
  def dot(a: Column, b: Column): Column =
    Shim.toColumn(
      VectorKernels.DotProduct(
        Shim.toExpression(asDouble(a)),
        Shim.toExpression(asDouble(b))
      )
    )

  /** Sum of squares — the dot-product kernel applied to one input (same
    * arithmetic as the `transform(x => x*x)` fold it replaces).
    */
  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize: pre-normalizing once turns every downstream cosine
    * into a plain dot product — the right layout for repeated ANN probes
    * at scale.
    *
    * Compiled kernel (see [[VectorKernels.l2Normalize]]), bit-identical to
    * the HOF formulation `transform(ad, x => x / sqrt(aggregate(
    * transform(ad, x => x*x), 0.0, _+_)))` with the norm let-bound: same
    * ascending-index double summation, same divide. The HOF version was
    * interpreted on every embedding row of every s01/s02/d05/d07 plan.
    */
  def l2Normalize(a: Column): Column =
    Shim.toColumn(VectorKernels.L2Normalize(Shim.toExpression(asDouble(a))))

  /** Squared euclidean distance (compiled kernel, no sqrt) — monotone in
    * the distance, so argmin-style uses (centroid assignment, PQ codes)
    * skip the sqrt entirely.
    */
  def sqDist(a: Column, b: Column): Column =
    Shim.toColumn(
      VectorKernels.SqDiffSum(
        Shim.toExpression(asDouble(a)),
        Shim.toExpression(asDouble(b))
      )
    )

  /** Euclidean distance via the compiled squared-difference-sum kernel
    * (hot in IVF centroid assignment: nCentroids evaluations per row).
    */
  def euclidean(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** Element-wise difference (compiled; the `zip_with(a, b, _ - _)` HOF
    * is interpreted). Used for IVF-PQ residuals: vec − assigned centroid.
    */
  def vecSub(a: Column, b: Column): Column =
    Shim.toColumn(
      VectorKernels.VecSub(
        Shim.toExpression(asDouble(a)),
        Shim.toExpression(asDouble(b))
      )
    )
}

/** Row-level vector kernels + their Catalyst expressions, following the
  * [[HashExpressionImpls]] pattern: one plain-object kernel shared by the
  * interpreted `eval` and the generated Java (via Scala's static
  * forwarders), so the expression stays inside the surrounding
  * whole-stage-codegen span.
  */
object VectorKernels {

  /** Sum-of-squares in ascending index order (matches `aggregate`'s left
    * fold), sqrt, divide. Non-null double elements required (embedding
    * columns are non-null float arrays); an all-zero vector yields NaNs,
    * like the HOF it replaces.
    */
  def l2Normalize(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = arr.getDouble(i) / norm
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Both inputs must have the same length: the HOF these kernels replace
    * null-padded a mismatch into a null result (slow but loud); reading
    * past the shorter array would instead crash on GenericArrayData or
    * return garbage on UnsafeArrayData (e.g. a `dim` param that doesn't
    * match the real embedding width producing nondeterministic
    * signatures). Fail fast with the lengths in the message.
    */
  private def checkSameLength(a: ArrayData, b: ArrayData, op: String): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$op requires equal-length arrays, got ${a.numElements()} and ${b.numElements()}"
      )

  /** Dot product in ascending index order (matches the left fold of the
    * `aggregate(zip_with(...))` HOF it replaces). Arrays must be the same
    * length with non-null double elements (embedding columns and literal
    * plane/centroid vectors satisfy both).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    checkSameLength(a, b, "vec_dot")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Sum of squared element differences, ascending index order. */
  def sqDiffSum(a: ArrayData, b: ArrayData): Double = {
    checkSameLength(a, b, "vec_sqdiffsum")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Element-wise a − b (equal lengths; see [[dot]]'s contract). */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    checkSameLength(a, b, "vec_sub")
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = a.getDouble(i) - b.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class VecSub(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_sub"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        (a, b) => s"graft.functions.VectorKernels.vecSub($a, $b)"
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): VecSub = copy(left = newLeft, right = newRight)
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        (a, b) => s"graft.functions.VectorKernels.dot($a, $b)"
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): DotProduct = copy(left = newLeft, right = newRight)
  }

  case class SqDiffSum(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_sqdiffsum"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      sqDiffSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        (a, b) => s"graft.functions.VectorKernels.sqDiffSum($a, $b)"
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): SqDiffSum = copy(left = newLeft, right = newRight)
  }

  case class L2Normalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "l2_normalize"

    override protected def nullSafeEval(input: Any): Any =
      l2Normalize(input.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.VectorKernels.l2Normalize($c)"
      )

    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }
}
