package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by eval and generated code. */
object TurtleLiterals {
  private val XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

  /** Turtle literal rendering: escape `\ " \n \r \t`, quote, and append
    * `^^<datatype>` for non-string datatypes (xsd:string and empty render
    * plain, the RDF 1.1 convention the reference's rdflib serializer
    * follows). Zero-copy scan first: clean strings skip the rebuild.
    */
  def render(value: UTF8String, datatype: UTF8String): UTF8String = {
    val s = value.toString
    var needsEscape = false
    var i = 0
    while (!needsEscape && i < s.length) {
      val c = s.charAt(i)
      needsEscape = c == '\\' || c == '"' || c == '\n' || c == '\r' || c == '\t'
      i += 1
    }
    val escaped =
      if (!needsEscape) s
      else {
        val sb = new java.lang.StringBuilder(s.length + 8)
        var j = 0
        while (j < s.length) {
          s.charAt(j) match {
            case '\\' => sb.append("\\\\")
            case '"' => sb.append("\\\"")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case '\t' => sb.append("\\t")
            case c => sb.append(c)
          }
          j += 1
        }
        sb.toString
      }
    val dt = if (datatype == null) "" else datatype.toString
    val out =
      if (dt.isEmpty || dt == XSD_STRING) "\"" + escaped + "\""
      else "\"" + escaped + "\"^^<" + dt + ">"
    UTF8String.fromString(out)
  }
}

/** Native Catalyst expression for Turtle literal rendering — replaces
  * the scalar UDF on the Turtle sink's literal branch so the whole
  * formatting projection stays inside whole-stage codegen (the last UDF
  * in the engine; SURVEY §2.9 / §7.3).
  */
case class TurtleLiteral(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(value: Any, datatype: Any): Any =
    TurtleLiterals.render(value.asInstanceOf[UTF8String],
      datatype.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, d) => s"graft.functions.TurtleLiterals.render($v, $d)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TurtleLiteral = copy(left = newLeft, right = newRight)

  override def prettyName: String = "turtle_literal"
}

object TurtleLiteral {
  def apply(value: Column, datatype: Column): Column =
    org.apache.spark.sql.functions.call_function("turtle_literal", value, datatype)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "turtle_literal", exprs => TurtleLiteral(exprs.head, exprs(1)), "built-in")
}
