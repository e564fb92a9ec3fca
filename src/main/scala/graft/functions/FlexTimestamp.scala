package graft.functions

import java.text.SimpleDateFormat
import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.util.TimeZone

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-format "flexible" timestamp parser with the reference's semantics
  * (behavior of `opentraffic/csv-loader` CsvLoader.java:237-273):
  *
  *  1. Snip a fractional-seconds run starting at the first `.` and ending at
  *     the first `+`, else the first `Z`, else end-of-string. The `Z`/`+tz`
  *     suffix itself is KEPT in the remaining string.
  *  2. Parse the remainder with a 3-format cascade:
  *     a. `yyyy-MM-dd HH:mm:ssX` (ISO zone: `+05`, `+0530`, `Z`),
  *     b. `yyyy-MM-dd HH:mm:ss`  (zoneless — pinned to UTC here; the
  *        reference used the JVM default TZ, which is not reproducible),
  *     c. ISO-8601 (`2015-02-14T18:51:42Z` and friends).
  *  3. Re-add the snipped fraction as `(long)(parseDouble("0" + frac) * 1000)`
  *     milliseconds — bit-identical Java double arithmetic, including any
  *     IEEE-754 truncation on fractions whose product lands below the
  *     integer (e.g. ".9999999999999999" → 999 ms).
  *
  * Returns epoch millis (LongType), or null when unparseable (the permissive
  * drop-malformed contract, CsvLoader.java:140-143).
  */
object FlexTimestamp {

  // SimpleDateFormat is not thread-safe: one pair per executor thread.
  private val fmts = new ThreadLocal[(SimpleDateFormat, SimpleDateFormat)] {
    override def initialValue(): (SimpleDateFormat, SimpleDateFormat) = {
      val f1 = new SimpleDateFormat("yyyy-MM-dd HH:mm:ssX")
      val f2 = new SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      f2.setTimeZone(TimeZone.getTimeZone("UTC"))
      (f1, f2)
    }
  }

  /** Static entry point used by both interpreted eval and codegen. */
  def parseToMillis(input: UTF8String): java.lang.Long = {
    if (input == null) return null
    try {
      var s = input.toString.trim
      if (s.isEmpty) return null

      // 1. snip fractional seconds
      val snipStart = s.indexOf('.')
      var frac = "0.0"
      if (snipStart >= 0) {
        var snipEnd = s.indexOf('+')
        if (snipEnd < 0) snipEnd = s.indexOf('Z')
        if (snipEnd < 0) snipEnd = s.length
        frac = "0" + s.substring(snipStart, snipEnd)
        s = s.substring(0, snipStart) + s.substring(snipEnd)
      }

      // 2. format cascade
      val base: Long = {
        val (f1, f2) = fmts.get()
        try f1.parse(s).getTime
        catch {
          case _: Exception =>
            try f2.parse(s).getTime
            catch { case _: Exception => parseIso(s) }
        }
      }

      // 3. fraction re-added as millis (reference's double-math quirk kept)
      java.lang.Long.valueOf(base + (java.lang.Double.parseDouble(frac) * 1000).toLong)
    } catch {
      case _: Exception => null
    }
  }

  private def parseIso(s: String): Long = {
    try Instant.parse(s).toEpochMilli
    catch {
      case _: Exception =>
        try OffsetDateTime.parse(s).toInstant.toEpochMilli
        catch {
          case _: Exception =>
            LocalDateTime.parse(s).toInstant(ZoneOffset.UTC).toEpochMilli
        }
    }
  }
}

/** Catalyst expression wrapping [[FlexTimestamp.parseToMillis]]. Codegen
  * emits a static call, so the expression stays inside whole-stage codegen.
  */
case class ParseFlexTimestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FlexTimestamp.parseToMillis(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}Tmp = graft.functions.FlexTimestamp.parseToMillis($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseFlexTimestamp =
    copy(child = newChild)
}

object ParseFlexTimestamp {
  /** Column-API entry: `flex_timestamp_ms($"ts_str")` → epoch millis. */
  def apply(c: Column): Column =
    ExpressionUtils.column(ParseFlexTimestamp(ExpressionUtils.expression(c)))
}
