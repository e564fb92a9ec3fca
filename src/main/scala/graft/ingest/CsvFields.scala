package graft.ingest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Splits one RFC-4180 CSV line into fields (quoted fields, `""` escapes,
  * embedded commas). Single-line records only — the vehicle ingest format
  * (behavior of opentraffic/csv-loader CsvLoader.java:100, RFC4180 parser)
  * never embeds newlines in GPS/taxi rows, and line-splitting upstream is
  * what lets the scan parallelize by HDFS split at 100 TB.
  */
object CsvFields {
  def split(line: UTF8String): ArrayData = {
    if (line == null) return null
    val s = line.toString
    val out = ArrayBuffer.empty[UTF8String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else c match {
        // A quote only OPENS a quoted section at field start (commons-csv /
        // RFC-4180); mid-field stray quotes (`ab"c,d`) are literal chars.
        case '"' if cur.length == 0 => inQuotes = true
        case ',' => out += UTF8String.fromString(cur.toString); cur.setLength(0)
        case _   => cur.append(c)
      }
      i += 1
    }
    out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray[Any])
  }
}

case class CsvFieldsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CsvFields.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ingest.CsvFields.split($c);")

  override protected def withNewChildInternal(newChild: Expression): CsvFieldsExpr =
    copy(child = newChild)
}

object CsvFieldsExpr {
  def apply(c: Column): Column =
    ExpressionUtils.column(CsvFieldsExpr(ExpressionUtils.expression(c)))
}
