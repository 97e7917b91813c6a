package graft.behavioral

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-wide injection point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.behavioral.GraftExtensions ...
  * }}}
  *
  * registers the behavioral family in every session's function registry —
  * the deployment-grade equivalent of calling
  * `BehavioralFunctions.register(spark)` per session (which remains the
  * programmatic path). The reference's analogue is `LOAD behavioral`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("sessionize",
      "sessionize(ts, gap) OVER (PARTITION BY k ORDER BY ts) - gap-based session ids") {
      exprs => SessionizeWindow(exprs(0), exprs(1))
    }
    inject("retention", "retention(cond1, ..., condN) - cohort retention flags") {
      exprs => RetentionAgg(exprs)
    }
    inject("window_funnel",
      "window_funnel(window[, mode], ts, cond1, ..., condN) - max funnel step") {
      exprs => WindowFunnelAgg(exprs)
    }
    inject("sequence_match", "sequence_match(pattern, ts, cond1, ...) - pattern exists") {
      exprs => SequenceMatchAgg(exprs)
    }
    inject("sequence_count", "sequence_count(pattern, ts, cond1, ...) - non-overlapping matches") {
      exprs => SequenceCountAgg(exprs)
    }
    inject("sequence_match_events",
      "sequence_match_events(pattern, ts, cond1, ...) - first match step timestamps") {
      exprs => SequenceMatchEventsAgg(exprs)
    }
    inject("sequence_next_node",
      "sequence_next_node(direction, base, ts, value, baseCond, ev1, ...) - next/prev value") {
      exprs => SequenceNextNodeAgg(exprs)
    }
    // the mergeable rollup twins — the same list the per-session
    // register() path carries (the cluster path must not lag it: a rollup
    // table built per-session is useless to a cluster that cannot merge it)
    inject("retention_state",
      "retention_state(cond1, ..., condN) - mergeable retention partial") {
      exprs => RetentionStateAgg(exprs)
    }
    inject("retention_merge",
      "retention_merge(state, nConds) - fold retention_state partials") {
      exprs => RetentionMergeAgg(exprs)
    }
    inject("funnel_state",
      "funnel_state(ts, cond1, ..., condN) - mergeable behavioral event state") {
      exprs => FunnelStateAgg(exprs)
    }
    inject("funnel_merge",
      "funnel_merge(window[, mode], state) - fold funnel_state partials") {
      exprs => FunnelMergeAgg(exprs)
    }
    inject("sequence_match_merge",
      "sequence_match_merge(pattern, state) - sequence_match over funnel_state partials") {
      exprs => SequenceMatchMergeAgg(exprs)
    }
    inject("sequence_count_merge",
      "sequence_count_merge(pattern, state) - sequence_count over funnel_state partials") {
      exprs => SequenceCountMergeAgg(exprs)
    }
    inject("sequence_match_events_merge",
      "sequence_match_events_merge(pattern, state) - sequence_match_events over funnel_state partials") {
      exprs => SequenceMatchEventsMergeAgg(exprs)
    }
    inject("next_node_state",
      "next_node_state(ts, value, baseCond, ev1, ...) - mergeable sequence_next_node partial") {
      exprs => NextNodeStateAgg(exprs)
    }
    inject("next_node_merge",
      "next_node_merge(direction, base, state) - fold next_node_state partials") {
      exprs => NextNodeMergeAgg(exprs)
    }
    inject("funnel_state_combine",
      "funnel_state_combine(state) - fold funnel_state partials into one state") {
      exprs => FunnelStateCombineAgg(exprs)
    }
    inject("next_node_state_combine",
      "next_node_state_combine(state) - fold next_node_state partials into one state") {
      exprs => NextNodeStateCombineAgg(exprs)
    }
    inject("retention_state_combine",
      "retention_state_combine(state) - fold retention_state partials into one state") {
      exprs => RetentionStateCombineAgg(exprs)
    }

    // the pipeline scalar kernels (sketches, winnowing, intersection,
    // dot product) share one builder list with the per-session
    // PipelineFunctions.register path
    graft.functions.PipelineFunctions.builders.foreach { case (name, b) =>
      inject(name, s"$name(...) - graft pipeline kernel")(b)
    }
  }
}
