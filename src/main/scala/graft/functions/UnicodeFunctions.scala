package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text-dedup pipelines.
  *
  * Exact dedup is only as good as its byte equality: the same visible
  * string arrives from crawls both precomposed (é = U+00E9) and
  * decomposed (e + U+0301), and those byte-differ, splitting what should
  * be one duplicate group. NFC normalization (UAX #15 canonical
  * composition) folds them; `java.text.Normalizer` is the JRE's
  * reference implementation and agrees with DuckDB's utf8proc-based
  * `nfc_normalize`, so canonicalized outputs stay DuckDB-oracle-exact
  * (the t14 gate).
  *
  * Compiled expression (same pattern as [[HashExpressions]]): a static
  * call keeps it inside whole-stage codegen; the fast path returns the
  * input buffer untouched when it is already NFC (true for all-ASCII,
  * i.e. almost every row), so the common case allocates nothing.
  */
object UnicodeFunctions {

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(input: Any): Any =
      UnicodeFunctionImpls.nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.functions.UnicodeFunctionImpls.nfc($c)"
      )

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  def nfc_normalize(text: Column): Column =
    Shim.toColumn(NfcNormalize(Shim.toExpression(text)))
}

object UnicodeFunctionImpls {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
