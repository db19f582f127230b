package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup hot paths.
  *
  * The pure-`Column` formulations (array of 32 `array_min(transform(...))`
  * minhashes; 64 `aggregate(...)` bit votes) are higher-order functions,
  * which Spark evaluates INTERPRETED (CodegenFallback) — measured ~12 s
  * per 5k docs at sf0.1. These expressions compute the same signatures in
  * one compiled pass over the tokens: O(shingles) hashing via
  * double-hashing (Kirsch–Mitzenmacher) for MinHash, O(tokens) for
  * SimHash. Row-at-a-time `eval` into compiled Scala — the inner loops
  * JIT-compile, unlike interpreted Catalyst trees.
  */
object HashExpressions {

  private val seedA = 42L // matches Spark's xxhash64 default seed
  private val seedB = 0x7A3C5E1FD1CE4E5BL

  private def hashUtf8(s: UTF8String, seed: Long): Long =
    Shim.xxhash64String(s, seed)

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
  ) extends UnaryExpression
      with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = text.split(" ", -1)
      val shingles = new java.util.HashSet[String]()
      if (toks.length <= shingleSize) {
        shingles.add(toks.mkString(" "))
      } else {
        val sb = new StringBuilder
        var i = 0
        while (i <= toks.length - shingleSize) {
          sb.setLength(0)
          var j = 0
          while (j < shingleSize) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          shingles.add(sb.toString)
          i += 1
        }
      }
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val it = shingles.iterator()
      while (it.hasNext) {
        val sh = UTF8String.fromString(it.next())
        val h1 = hashUtf8(sh, seedA)
        val h2 = hashUtf8(sh, seedB) | 1L
        var k = 0
        var g = h1
        while (k < numHashes) {
          if (g < sig(k)) sig(k) = g
          g += h2
          k += 1
        }
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash: per-bit majority vote over distinct-token xxhash64
    * values. Bit-compatible with the HOF formulation (same token hash:
    * xxhash64 seed 42; same vote and packing rule).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression
      with CodegenFallback {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = text.split(" ", -1)
      val seen = new java.util.HashSet[String]()
      val votes = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        if (seen.add(toks(i))) {
          val h = hashUtf8(UTF8String.fromString(toks(i)), seedA)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  // ------------------------------------------------------ Column wrappers

  def minhash_sig(text: Column, numHashes: Int, shingleSize: Int): Column =
    Shim.toColumn(MinHashSig(Shim.toExpression(text), numHashes, shingleSize))

  def simhash64(text: Column): Column =
    Shim.toColumn(SimHash64(Shim.toExpression(text)))
}
