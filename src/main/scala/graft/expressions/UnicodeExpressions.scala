package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Why it exists: text dedup/fingerprinting breaks when the SAME visible
  * string arrives in different codepoint sequences — 'é' as U+00E9 vs
  * e + COMBINING ACUTE — so canonical composition is a standard first
  * step of any multilingual corpus pipeline (every md5/minhash/simhash
  * key downstream assumes it). Spark has no built-in normalizer; a Scala
  * UDF would break whole-stage codegen around the hottest projection in
  * the pipeline. This expression wraps `java.text.Normalizer` (the JDK's
  * Unicode-standard NFC — the same canonical composition DuckDB's
  * utf8proc `nfc_normalize` implements, which is what lets the oracle
  * replay it) behind `doGenCode`, with an `isNormalized` fast path so
  * already-composed text (almost everything in practice) never
  * allocates.
  */
object UnicodeSupport {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** graft_nfc(string) → string in Unicode Normalization Form C. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeSupport.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeSupport$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
