package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the code-aware tokenizer: one scan
  * pass per row inside whole-stage codegen, replacing the built-in
  * pipeline regexp_replace -> lower -> split -> filter (three regex
  * traversals plus intermediate strings) on the training-data ops'
  * hottest scalar. Semantics are IDENTICAL to Analyzer.tokenize /
  * tokensCol (asserted in AnalyzerSpec; the DuckDB oracles gate it on
  * every ops query).
  */
final case class CodeTokens(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // pattern match, not == StringType: Spark 4 collated strings are
    // StringType(collationId != 0) and fail singleton equality — the
    // regexp pipeline this expression replaced accepted them, and
    // code_tokens lowercases anyway so any collation is safe
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"code_tokens expects a string column, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "code_tokens"

  override def nullSafeEval(input: Any): Any =
    CodeTokens.tokenizeUtf8(input.asInstanceOf[UTF8String])

  // the generated Java calls the static forwarder on the companion —
  // the row pipeline stays inside WholeStageCodegen (no UDF
  // encode/decode boundary)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeTokens.tokenizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): CodeTokens =
    copy(child = newChild)
}

object CodeTokens {
  /** Entry point for both eval and generated code. */
  def tokenizeUtf8(s: UTF8String): ArrayData = {
    val toks = graft.analyze.Analyzer.tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    GraftExpressionBridge.column(CodeTokens(GraftExpressionBridge.expression(c)))
}
