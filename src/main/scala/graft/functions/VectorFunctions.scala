package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector column functions over `ArrayType(FloatType)` embeddings.
  * Pure higher-order `Column` expressions (zip_with / aggregate) — codegen
  * path, no UDF, no shuffle; computed in double with sequential
  * ascending-index summation so results are reproducible across engines.
  * The one per-row hot-loop kernel ([[l2Normalize]]) is a compiled
  * expression: HOF lambdas are CodegenFallback, and a nested HOF on every
  * embedding row is exactly the interpreted-hot-loop class that made the
  * round-3/4 dedup paths pathological at scale.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def normSq(a: Column): Column = {
    val ad = asDouble(a)
    aggregate(transform(ad, x => x * x), lit(0.0), _ + _)
  }

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

  def euclidean(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
        lit(0.0),
        _ + _
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
