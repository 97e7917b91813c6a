package graft.behavioral

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Interval-argument extraction for behavioral functions.
  *
  * Mirrors the reference's interval normalization (reference:
  * `src/common/timestamp.rs:16-46`): day-time intervals normalize to
  * microseconds; month-bearing intervals are rejected (calendar-ambiguous).
  * Additionally accepts integral values interpreted as **seconds** (the
  * ClickHouse `windowFunnel(window)` convention) so callers without interval
  * literals can pass plain numbers.
  */
object IntervalArg {
  val MicrosPerSecond: Long = 1000000L
  val MicrosPerDay: Long = 86400L * MicrosPerSecond

  /** Extracts a microsecond duration from a foldable expression. */
  def micros(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a constant (foldable) expression, got: $e")
    val v = e.eval(InternalRow.empty)
    require(v != null, s"$what must not be NULL")
    e.dataType match {
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[CalendarInterval]
        if (ci.months != 0) {
          throw new IllegalArgumentException(
            s"$what: month-bearing intervals are ambiguous and not supported")
        }
        ci.days * MicrosPerDay + ci.microseconds
      case _: DayTimeIntervalType => v.asInstanceOf[Long]
      case _: YearMonthIntervalType =>
        throw new IllegalArgumentException(
          s"$what: month/year intervals are ambiguous and not supported")
      case IntegerType => v.asInstanceOf[Int].toLong * MicrosPerSecond
      case LongType => v.asInstanceOf[Long] * MicrosPerSecond
      case other =>
        throw new IllegalArgumentException(
          s"$what: expected INTERVAL or integral seconds, got $other")
    }
  }

  /** Extracts a constant string argument (mode / pattern / direction / base). */
  def string(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a constant (foldable) expression, got: $e")
    e.eval(InternalRow.empty) match {
      case null => null
      case s: UTF8String => s.toString
      case s: String => s
      case other =>
        throw new IllegalArgumentException(s"$what: expected STRING, got $other")
    }
  }
}
