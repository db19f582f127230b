package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup hot paths.
  *
  * The pure-`Column` formulations (array of 32 `array_min(transform(...))`
  * minhashes; 64 `aggregate(...)` bit votes) are higher-order functions,
  * which Spark evaluates INTERPRETED — measured ~12 s per 5k docs at
  * sf0.1. These expressions compute the same signatures in one compiled
  * pass over the tokens (O(shingles) hashing via Kirsch–Mitzenmacher
  * double hashing for MinHash, O(tokens) for SimHash), and emit codegen
  * (a static call into [[HashExpressionImpls]]) so they stay inside the
  * surrounding whole-stage-codegen span instead of forcing a fallback.
  */
object HashExpressions {

  /** MinHash signature: distinct word `shingleSize`-shingles → for seed i,
    * min over shingles of g_i(sh) = h1(sh) + i*h2(sh). Output
    * Array[Long](numHashes). Short docs (< shingleSize tokens) hash the
    * whole text as their single shingle — every doc lands in exactly one
    * bucket per band.
    */
  case class MinHashSig(
      child: Expression,
      numHashes: Int,
      shingleSize: Int
  ) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(input: Any): Any =
      HashExpressionImpls.minhashSig(
        input.asInstanceOf[UTF8String],
        numHashes,
        shingleSize
      )

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c =>
          s"graft.functions.HashExpressionImpls.minhashSig($c, $numHashes, $shingleSize)"
      )

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash: per-bit majority vote over distinct-token xxhash64
    * values. Bit-compatible with the HOF formulation (same token hash:
    * xxhash64 seed 42; same vote and packing rule).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        HashExpressionImpls.simhash64(input.asInstanceOf[UTF8String])
      )

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.HashExpressionImpls.simhash64($c)"
      )

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** 128-bit SimHash as Array[Long](2): the wide-radius fingerprint
    * (see [[HashExpressionImpls.simhash128]]). Same compiled one-pass
    * shape as [[SimHash64]].
    */
  case class SimHash128(child: Expression) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "simhash128"

    override protected def nullSafeEval(input: Any): Any =
      HashExpressionImpls.simhash128(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.HashExpressionImpls.simhash128($c)"
      )

    override protected def withNewChildInternal(newChild: Expression): SimHash128 =
      copy(child = newChild)
  }

  /** Polynomial rolling hash over code points, (h*31 + cp) mod 1e9+7.
    * Matches the `aggregate(split(text,""), ...)` HOF bit-for-bit — on ALL
    * text, including supplementary characters: Spark strings are UTF-8 and
    * `split(text, "")` splits at code-point boundaries (unlike
    * `java.lang.String.split`, which fractures surrogate pairs), so the
    * HOF sees whole code points too. Equivalence is gated by a ScalaTest
    * including a non-BMP string. The kernel's win is purely physical: no
    * per-character array allocation, no interpreted HOF evaluation.
    */
  case class RollingHash64(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash64"

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        HashExpressionImpls.rollingHash64(input.asInstanceOf[UTF8String])
      )

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.HashExpressionImpls.rollingHash64($c)"
      )

    override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
      copy(child = newChild)
  }

  /** Distinct word k-shingles, first-occurrence order. Element-identical
    * to `array_distinct(transform(sequence(...), slice/concat_ws))` —
    * which is TWO interpreted HOF passes per row on the dedup verify path
    * (measured 0.66 s/pass vs 0.25 s for the whole compiled MinHash
    * signature at sf0.1). Gated by a ScalaTest equivalence against the
    * HOF formulation.
    */
  case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingle_set"

    override protected def nullSafeEval(input: Any): Any =
      HashExpressionImpls.shingleSet(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.HashExpressionImpls.shingleSet($c, $k)"
      )

    override protected def withNewChildInternal(newChild: Expression): ShingleSet =
      copy(child = newChild)
  }

  // ------------------------------------------------------ Column wrappers

  def minhash_sig(text: Column, numHashes: Int, shingleSize: Int): Column =
    Shim.toColumn(MinHashSig(Shim.toExpression(text), numHashes, shingleSize))

  def shingle_set(text: Column, k: Int): Column =
    Shim.toColumn(ShingleSet(Shim.toExpression(text), k))

  def simhash64(text: Column): Column =
    Shim.toColumn(SimHash64(Shim.toExpression(text)))

  def simhash128(text: Column): Column =
    Shim.toColumn(SimHash128(Shim.toExpression(text)))

  def rolling_hash64(text: Column): Column =
    Shim.toColumn(RollingHash64(Shim.toExpression(text)))
}
