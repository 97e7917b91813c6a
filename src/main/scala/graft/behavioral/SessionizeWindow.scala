package graft.behavioral

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** `sessionize(ts, gap) OVER (PARTITION BY ... ORDER BY ts) -> BIGINT` —
  * gap-based session IDs.
  *
  * Semantics (reference: `src/sessionize.rs:304-367`):
  *   - the first row of a partition gets session 1;
  *   - a gap STRICTLY GREATER than the threshold starts a new session
  *     (a gap exactly equal to the threshold stays in the session);
  *   - a NULL ts row's output is NULL and the row does not affect its
  *     neighbors' session IDs (`test/sql/sessionize.test:46-54`);
  *   - month-bearing gap intervals are rejected (calendar-ambiguous).
  *
  * Implementation: a declarative `AggregateWindowFunction` (like `lag` /
  * `row_number`) over the running ROWS UNBOUNDED PRECEDING..CURRENT ROW
  * frame. Spark's WindowExec evaluates it incrementally — one state update
  * per row, O(n) per partition, no buffering of the partition in the
  * aggregate itself. The reference needs an O(1)-combine segment-tree state
  * because of DuckDB's window executor; Spark's running-frame evaluation
  * makes that machinery unnecessary — the state is just
  * (last non-null ts, session counter), updated left to right.
  *
  * The whole computation stays in Catalyst expressions (no closures), so the
  * projection is codegen-friendly, and WindowExec's shuffle on the partition
  * key is the only data movement — the idiomatic Spark plan at any scale.
  */
case class SessionizeWindow(ts: Expression, gap: Expression)
  extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts, gap)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sessionize"

  private lazy val gapMicros: Long = IntervalArg.micros(gap, "sessionize gap")

  private lazy val tsMicros: Expression = ts.dataType match {
    case TimestampType | TimestampNTZType => UnixMicros(Cast(ts, TimestampType))
    case LongType => ts // already micros
    case other => throw new IllegalArgumentException(
      s"sessionize ts must be TIMESTAMP, got $other")
  }

  private lazy val lastTs = AttributeReference("sessionize_last_ts", LongType)()
  private lazy val sess = AttributeReference("sessionize_sess", LongType, nullable = false)()
  // evaluateExpression may only reference buffer attributes, so the current
  // row's NULL-ts flag must live in the buffer (the running ROWS frame's last
  // update IS the current row).
  private lazy val curNull = AttributeReference("sessionize_cur_null", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(lastTs, sess, curNull)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val cur = tsMicros
    val newLast = If(IsNull(ts), lastTs, cur)
    val newSess = If(IsNull(ts), sess,
      If(IsNull(lastTs), Add(sess, Literal(1L)), // first non-null row → session 1
        If(GreaterThan(Subtract(cur, lastTs), Literal(gapMicros)),
          Add(sess, Literal(1L)), sess)))
    Seq(newLast, newSess, IsNull(ts))
  }

  override lazy val evaluateExpression: Expression =
    If(curNull, Literal(null, LongType), sess)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren(0), gap = newChildren(1))
}
