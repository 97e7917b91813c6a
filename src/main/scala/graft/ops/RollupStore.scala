package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** An INCREMENTALLY-INGESTED STATE TABLE: the rollup pattern
  * (q105/q108–q116 — fold the raw log once into mergeable partials,
  * answer dashboards from the partials) made maintainable. Each ingest
  * run appends one batch of `(key columns..., state)` rows built with a
  * state producer (`funnel_state`/`next_node_state` emit BINARY,
  * `retention_state` BIGINT); dashboard queries read the union and
  * re-merge with the matching `*_merge`, whose window/mode/pattern/
  * direction arguments live at MERGE time — so one store serves every
  * variant of its family.
  *
  * Why a store and not just a parquet dir: daily ingest accretes (a) one
  * directory per run forever — the small-files wall — and (b) MULTIPLE
  * partial rows per (key, grain), so every dashboard query re-pays the
  * union of all history. [[compact]] periodically folds both back: all
  * committed batches collapse to ONE batch holding ONE row per key, the
  * partials folded state-to-state with the family's combine twin
  * (`funnel_state_combine` / `next_node_state_combine` /
  * `retention_state_combine`) — the raw event log is NEVER rescanned. Exactness is the combine twins' associativity
  * argument (multiset union over the event buffer, see
  * `FunnelStateCombineAgg`): any fold tree merges to the answer a raw
  * scan would give, which RollupStoreSpec and q118 pin oracle-side at
  * every step of the cycle.
  *
  * Storage protocol: [[GenerationalBatches]] — the same marker-last
  * commit, folded-dir tombstones, crashed-dir recovery, and single-writer
  * lease the incremental session store uses, crash-matrixed by both
  * specs. Readers take no lease; a read that must not straddle a
  * compaction's cleanup window should snapshot (see [[read]]).
  *
  * At 100 TB: the store is O(keys × grain) — dashboard-sized by
  * construction — while the log it summarizes is O(events); ingest costs
  * one scan of the DELTA, compaction one scan of the (small) store, and
  * queries never touch the log.
  */
object RollupStore {

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Append one batch of state rows (`keyCols` + a BINARY `stateCol`;
    * exactly those columns, so every batch unions cleanly). Returns the
    * row count. NULL states are refused at the door: inside the store a
    * NULL state is indistinguishable from "key absent in this batch",
    * and the producer aggregates never emit one anyway. */
  def appendStates(states: DataFrame, baseDir: String,
      keyCols: Seq[String], stateCol: String = "state",
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    appendStates(states, baseDir, keyCols, stateCol, _ => (), leaseStaleMs)

  private[graft] def appendStates(states: DataFrame, baseDir: String,
      keyCols: Seq[String], stateCol: String,
      onStep: String => Unit,
      leaseStaleMs: Long): Long = {
    require(keyCols.nonEmpty, "rollup store needs at least one key column")
    val expected = (keyCols :+ stateCol).toSet
    require(states.columns.toSet == expected,
      s"state batch columns ${states.columns.toSet} != $expected")
    // BINARY covers the funnel/next-node families, BIGINT retention's
    // 8-byte bitmask — whatever the family's *_state producer emits
    require(states.schema(stateCol).dataType == BinaryType
        || states.schema(stateCol).dataType == LongType,
      s"$stateCol must be a *_state partial column (BINARY or BIGINT), got " +
        states.schema(stateCol).dataType)
    val spark = states.sparkSession
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      val committed = GenerationalBatches.recover(fs, base)
      onStep("recovered")
      // the door check above validates the batch in ISOLATION; against an
      // existing store also require the same schema, or a funnel store
      // would accept a retention batch (both pass the type gate) and only
      // explode at compact/read time, far from the offending ingest
      committed.sortBy(_._1).lastOption.foreach { case (_, p) =>
        val existing = spark.read.parquet(new Path(p, "states").toString)
          .schema.map(f => f.name -> f.dataType).toMap
        val incoming = states.schema.map(f => f.name -> f.dataType).toMap
        require(incoming == existing,
          s"state batch schema $incoming does not match the store's " +
            s"$existing; one store holds one state family at one grain")
      }
      val k = committed.map(_._1).maxOption.map(_ + 1).getOrElse(0L)
      val batchPath = new Path(base, s"batch_$k")
      val cached = states.persist()
      try {
        val n = cached.count()
        // a quiet day commits as a no-op, like the session store's empty delta
        if (n == 0) { onStep("committed"); return 0L }
        val nulls = cached.filter(col(stateCol).isNull).count()
        require(nulls == 0,
          s"$nulls NULL $stateCol rows; the *_state producers never emit " +
            "NULL — filter placeholder rows before ingest")
        val dataPath = new Path(batchPath, "states")
        cached.write.mode("overwrite").parquet(dataPath.toString)
        // footer-metadata verify, no re-scan (Sinks.parquetRowCount)
        val written = graft.sources.Sinks.parquetRowCount(fs, dataPath,
          spark.sessionState.newHadoopConf())
        require(written == n,
          s"state batch changed the row count ($n -> $written); " +
            s"batch_$k left uncommitted")
        onStep("written")
        GenerationalBatches.commit(fs, batchPath, Seq.empty)
        onStep("committed")
        n
      } finally cached.unpersist()
    }
  }

  /** Fold every committed batch into ONE batch with ONE row per key: the
    * partials of each key combined state-to-state via `combine` (the
    * family's combine twin, e.g.
    * `BehavioralFunctions.funnel_state_combine`). Pure maintenance — any
    * downstream merge reads the same event multiset before and after
    * (the combine twins' associativity). Verified before commit: the
    * written files' footer row count must equal the fold's own row count
    * (one row per key, by construction of the groupBy). Crash-ordering
    * and `onStep` seam as in
    * `IncrementalSession.compactBatches` (recovered / written /
    * committed / cleaned). Returns the compacted row count. */
  def compact(spark: SparkSession, baseDir: String, keyCols: Seq[String],
      combine: Column => Column, stateCol: String = "state",
      targetPartitions: Int = 32,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    compact(spark, baseDir, keyCols, combine, stateCol, targetPartitions,
      _ => (), leaseStaleMs)

  private[graft] def compact(spark: SparkSession, baseDir: String,
      keyCols: Seq[String], combine: Column => Column, stateCol: String,
      targetPartitions: Int, onStep: String => Unit,
      leaseStaleMs: Long): Long = {
    require(targetPartitions > 0,
      s"targetPartitions must be positive, got $targetPartitions")
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      val committed = GenerationalBatches.recover(fs, base).sortBy(_._1)
      onStep("recovered")
      if (committed.isEmpty) return 0L
      // one multi-path scan of the whole store (not a union chain), and
      // ONE scan only: the fold result is persisted, counted once, and the
      // write is footer-verified against that count — a separate
      // distinct-key pre-scan would double compaction I/O to re-verify
      // what groupBy structurally guarantees (one row per key)
      val all = spark.read.parquet(committed.map { case (_, p) =>
        new Path(p, "states").toString }: _*)
      val k = committed.last._1 + 1
      val batchPath = new Path(base, s"batch_$k")
      val dataPath = new Path(batchPath, "states")
      val folded = all.groupBy(keyCols.map(col): _*)
        .agg(combine(col(stateCol)).as(stateCol))
        .repartition(targetPartitions)
        .persist()
      val written = try {
        val expected = folded.count()
        folded.write.mode("overwrite").parquet(dataPath.toString)
        val written = graft.sources.Sinks.parquetRowCount(fs, dataPath,
          spark.sessionState.newHadoopConf())
        require(written == expected,
          s"compaction wrote $written of $expected folded rows; " +
            s"batch_$k left uncommitted, folded batches intact")
        written
      } finally folded.unpersist()
      onStep("written")
      GenerationalBatches.commit(fs, batchPath, committed.map(_._2.getName))
      onStep("committed")
      committed.foreach { case (_, p) => fs.delete(p, true) }
      onStep("cleaned")
      written
    }
  }

  /** All committed state rows — between compactions a key can appear in
    * several rows (one per ingest); every `*_merge` consumer folds them
    * anyway, so queries are exact at ANY point in the cycle. Lazy over
    * the resolved dir list: a plan held across a concurrent compaction's
    * CLEANUP can hit deleted files (availability, not wrong data — the
    * marker protocol keeps served data exact). Act on it promptly, or
    * pass `snapshot = true` to materialize per-file statuses eagerly. */
  def read(spark: SparkSession, baseDir: String,
      snapshot: Boolean = false): DataFrame = {
    val fs = fsOf(spark, baseDir)
    val dirs = GenerationalBatches.liveBatches(fs, new Path(baseDir))
      .sortBy(_._1)
      .map { case (_, p) => new Path(p, "states").toString }
    require(dirs.nonEmpty, s"no committed state batches under $baseDir")
    if (!snapshot) spark.read.parquet(dirs: _*)
    else {
      // pin the exact FILES, not the dirs: a compaction committing after
      // this point cannot change what the plan reads (its cleanup could
      // still delete them mid-action — at that point re-read; for true
      // snapshot isolation over object stores use a table format)
      // explicit file paths bypass Spark's default path filter, so apply
      // the same rules here: data files only — no '_' markers/_SUCCESS,
      // no '.'-prefixed hidden/checksum/temp files
      val files = dirs.flatMap { d =>
        fs.listStatus(new Path(d)).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")
            && !st.getPath.getName.startsWith("_")
            && !st.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      }
      spark.read.parquet(files: _*)
    }
  }

  /** Committed, not-yet-folded batch dirs — q118 pins that compaction
    * actually shrinks it. */
  def liveBatchCount(spark: SparkSession, baseDir: String): Int = {
    val fs = fsOf(spark, baseDir)
    GenerationalBatches.liveBatches(fs, new Path(baseDir)).size
  }

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
}
