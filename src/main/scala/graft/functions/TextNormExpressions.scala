package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — canonical composition (e + U+0301 -> é), the
  * standard first step of text cleanup before tokenization: tokenizers treat
  * composed and decomposed forms as different byte sequences, so a corpus
  * mixing them fragments the vocabulary and double-counts near-identical
  * spans. Spark has no built-in for this; `java.text.Normalizer` (ICU-aligned
  * UAX #15) is the JVM-native implementation, and DuckDB's `nfc_normalize`
  * is the oracle twin — both implement the same Unicode standard, verified
  * byte-identical on composed output (md5 parity).
  *
  * Unlike the sketching expressions in [[TextHashExpressions]] this has a
  * real `doGenCode`: the body is a single static call, so it inlines into
  * whole-stage codegen with zero per-row interpretation overhead.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC))""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextNormFunctions {
  def nfc_normalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))
}
