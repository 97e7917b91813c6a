package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted internally by the similarity/dedup
  * operators, so callers (benchmarks, long-lived sessions, pipelines) can
  * release them once a result has been fully consumed. Without this, each
  * operator invocation leaks one or two cached sketch frames and a
  * long-running session eventually thrashes the storage memory pool.
  */
object OpCaches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private[ops] def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every operator-internal cache created so far. Safe to call
    * after the consuming action completes; results already computed are
    * unaffected. */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }
}
