package graft.behavioral.pattern

/** ClickHouse-compatible sequence-pattern mini-language.
  *
  * Grammar (reference: `src/pattern/parser.rs:13-23`, `docs`):
  *   - `(?N)`    — an event where condition N (1-indexed) is true
  *   - `.`       — exactly one event of any kind
  *   - `.*`      — zero or more events of any kind
  *   - `(?t>=N)` / `(?t<=N)` / `(?t>N)` / `(?t<N)` / `(?t==N)` / `(?t!=N)`
  *     — elapsed-time constraint in whole seconds vs. the previous matched
  *     event; does not consume an event. (`!=` is an extension beyond
  *     ClickHouse.)
  *
  * Whitespace between steps is skipped; an empty pattern is an error;
  * `(?0)` is an error (conditions are 1-indexed).
  */
sealed trait PStep
final case class PCond(idx: Int) extends PStep // 0-indexed internally
case object PAny extends PStep // `.*`
case object POne extends PStep // `.`
final case class PTime(op: TimeOp, seconds: Long) extends PStep

sealed abstract class TimeOp {
  def eval(elapsedSeconds: Long, threshold: Long): Boolean
}
object TimeOp {
  case object Gte extends TimeOp { def eval(e: Long, t: Long): Boolean = e >= t }
  case object Lte extends TimeOp { def eval(e: Long, t: Long): Boolean = e <= t }
  case object Gt extends TimeOp { def eval(e: Long, t: Long): Boolean = e > t }
  case object Lt extends TimeOp { def eval(e: Long, t: Long): Boolean = e < t }
  case object Eq extends TimeOp { def eval(e: Long, t: Long): Boolean = e == t }
  case object Ne extends TimeOp { def eval(e: Long, t: Long): Boolean = e != t }
}

final case class PatternError(message: String, position: Int)

/** Recursive-descent parser for pattern strings (reference:
  * `src/pattern/parser.rs:101-312`). Invalid patterns yield `Left` — the
  * aggregates translate that to a NULL/empty result, never an error
  * (reference: `src/ffi/sequence.rs:108-112`).
  */
object PatternParser {

  def parse(input: String): Either[PatternError, Array[PStep]] = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[PStep]
    var pos = 0
    val len = input.length

    def peek(off: Int = 0): Int = if (pos + off < len) input.charAt(pos + off).toInt else -1

    def err(msg: String, p: Int = -1): Either[PatternError, Array[PStep]] =
      Left(PatternError(msg, if (p >= 0) p else pos))

    def parseNumber(): Either[PatternError, Long] = {
      val start = pos
      var num = 0L
      var digits = 0
      while (pos < len && input.charAt(pos).isDigit) {
        num = num * 10 + (input.charAt(pos) - '0')
        if (num < 0) return Left(PatternError("number overflow in pattern", start))
        digits += 1
        pos += 1
      }
      if (digits == 0) Left(PatternError("expected number", pos)) else Right(num)
    }

    while (pos < len) {
      // skip whitespace
      while (pos < len && input.charAt(pos).isWhitespace) pos += 1
      if (pos < len) {
        input.charAt(pos) match {
          case '(' =>
            pos += 1
            if (peek() != '?') return err("expected '?' after '('")
            pos += 1
            peek() match {
              case 't' =>
                pos += 1
                val op: TimeOp = (peek(), peek(1)) match {
                  case ('>', '=') => pos += 2; TimeOp.Gte
                  case ('<', '=') => pos += 2; TimeOp.Lte
                  case ('=', '=') => pos += 2; TimeOp.Eq
                  case ('!', '=') => pos += 2; TimeOp.Ne
                  case ('>', _) => pos += 1; TimeOp.Gt
                  case ('<', _) => pos += 1; TimeOp.Lt
                  case _ =>
                    return err("expected comparison operator (>=, <=, >, <, ==, !=) after '(?t'")
                }
                parseNumber() match {
                  case Left(e) => return Left(e)
                  case Right(num) =>
                    if (peek() != ')') return err("expected ')'")
                    pos += 1
                    steps += PTime(op, num)
                }
              case c if c >= '0' && c <= '9' =>
                val numStart = pos
                parseNumber() match {
                  case Left(e) => return Left(e)
                  case Right(num) =>
                    if (peek() != ')') return err("expected ')'")
                    pos += 1
                    if (num == 0) {
                      return err("condition index must be >= 1 (1-indexed)", numStart)
                    }
                    if (num > Int.MaxValue) return err("condition index too large", numStart)
                    steps += PCond(num.toInt - 1)
                }
              case -1 => return err("unexpected end of pattern after '(?'")
              case c => return err(s"expected digit or 't' after '(?', got '${c.toChar}'")
            }
          case '.' =>
            pos += 1
            if (peek() == '*') { pos += 1; steps += PAny }
            else steps += POne
          case c => return err(s"unexpected character '$c'")
        }
      }
    }
    if (steps.isEmpty) Left(PatternError("empty pattern", 0))
    else Right(steps.toArray)
  }
}
