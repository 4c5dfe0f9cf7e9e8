package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by eval and generated code. */
object Urls {
  private val hex = "0123456789ABCDEF".toCharArray

  private def unreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '_' || b == '.' || b == '~' || b == '-'

  /** Python urllib.parse.quote(s, safe="") parity over UTF-8 bytes
    * (reference: src/common/utils.py:104-106). Zero-copy fast path for
    * fully-unreserved inputs.
    */
  def encodeUtf8(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0; var clean = true
    while (clean && i < bytes.length) { clean = unreserved(bytes(i) & 0xff); i += 1 }
    if (clean) return s
    val sb = new java.lang.StringBuilder(bytes.length * 3)
    var j = 0
    while (j < bytes.length) {
      val b = bytes(j) & 0xff
      if (unreserved(b)) sb.append(b.toChar)
      else { sb.append('%'); sb.append(hex(b >> 4)); sb.append(hex(b & 0xf)) }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression for reference-parity percent-encoding —
  * participates in whole-stage codegen (no UDF serialization, no
  * CodegenFallback), SURVEY §4.4 / §7.3 (the one custom-Expression slot
  * the semantics justify).
  */
case class PercentEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Urls.encodeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Urls.encodeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentEncode =
    copy(child = newChild)

  override def prettyName: String = "percent_encode"
}

object PercentEncode {
  /** Column API — resolves through the function registry (call register
    * or install GraftExtensions first).
    */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("percent_encode", c)

  /** SQL registration: spark.sessionState.functionRegistry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "percent_encode", exprs => PercentEncode(exprs.head), "built-in")
}

/** spark-submit / config hook:
  * --conf spark.sql.extensions=graft.functions.GraftExtensions
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((
      FunctionIdentifier("percent_encode"),
      new ExpressionInfo(classOf[PercentEncode].getName, "percent_encode"),
      (exprs: Seq[Expression]) => PercentEncode(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("turtle_literal"),
      new ExpressionInfo(classOf[TurtleLiteral].getName, "turtle_literal"),
      (exprs: Seq[Expression]) => TurtleLiteral(exprs.head, exprs(1))))
  }
}
