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
  * `retention_state_combine`) — the raw event log is NEVER rescanned.
  * Exactness is the combine twins' associativity argument (multiset
  * union over the event buffer, see `FunnelStateCombineAgg`): any fold
  * tree merges to the answer a raw scan would give, which
  * RollupStoreSpec and q118 pin oracle-side at every step of the cycle.
  *
  * Replay safety: an ingest may tag itself with an `ingestId` — the
  * idempotence key for at-least-once delivery channels. Spark's
  * `foreachBatch` documents that a restarted query RE-DELIVERS its last
  * micro-batch with the same batchId; an id-tagged append whose id the
  * store has already committed is a committed no-op (exactly like the
  * empty delta), so the redelivery cannot double-append its partials —
  * which would change answers for every multiset family (funnel /
  * sequence / next-node; only retention's OR happens to be idempotent).
  * Ids are recorded in the batch's `_INGEST_IDS` file durable with the
  * commit marker and carried forward through compaction, so the guard
  * survives any number of folds (StreamingRollupIngestSpec pins the
  * same-id re-invoke, including after a mid-stream compaction).
  *
  * Grain partitioning: a store whose key includes a time grain can be
  * laid out with one sub-store per grain value (`day=2024-01-05/…`, see
  * [[appendStatesByGrain]]). Maintenance then touches only the grains
  * it names — [[compactGrains]] folds a RANGE (compact = O(touched
  * grains), not O(store)), [[dropGrains]] retires old grains atomically,
  * and [[readGrains]] prunes unqueried grains' files at listing time —
  * the difference between a store that survives years of daily ingest
  * at 100 TB and one whose every maintenance run re-folds all history.
  *
  * Storage protocol: [[GenerationalBatches]] — the same marker-last
  * commit, folded-dir tombstones, crashed-dir recovery, and single-writer
  * lease the incremental session store uses, crash-matrixed by both
  * specs. A grained store takes ONE lease at the store root for any
  * maintenance op, covering every grain it touches. Readers take no
  * lease; a read that must not straddle a compaction's cleanup window
  * should snapshot (see [[read]]).
  *
  * At 100 TB: the store is O(keys × grain) — dashboard-sized by
  * construction — while the log it summarizes is O(events); ingest costs
  * one scan of the DELTA, compaction one scan of the touched grains
  * (or of the whole — still small — store when flat), and queries never
  * touch the log.
  */
object RollupStore {

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Append one batch of state rows (`keyCols` + a BINARY `stateCol`;
    * exactly those columns, so every batch unions cleanly). Returns the
    * row count. NULL states are refused at the door: inside the store a
    * NULL state is indistinguishable from "key absent in this batch",
    * and the producer aggregates never emit one anyway.
    *
    * `ingestId` is the optional idempotence key: an id the store has
    * already committed makes the whole call a committed no-op returning
    * 0 — wire `foreachBatch`'s batchId through it (e.g.
    * `Some(s"$queryName/$batchId")`) and a restarted stream's redelivery
    * of its last micro-batch lands exactly once. The guard assumes
    * Spark's redelivery contract (same id = same data). */
  def appendStates(states: DataFrame, baseDir: String,
      keyCols: Seq[String], stateCol: String = "state",
      ingestId: Option[String] = None,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    appendStates(states, baseDir, keyCols, stateCol, ingestId, _ => (),
      leaseStaleMs)

  private[graft] def appendStates(states: DataFrame, baseDir: String,
      keyCols: Seq[String], stateCol: String, ingestId: Option[String],
      onStep: String => Unit,
      leaseStaleMs: Long): Long = {
    requireStateBatch(states, keyCols, stateCol)
    requireValidIngestId(ingestId)
    val spark = states.sparkSession
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      val committed = GenerationalBatches.recover(fs, base)
      onStep("recovered")
      // REPLAY GUARD: an already-committed ingest id means this delivery's
      // rows are already in the store — a committed no-op, like the empty
      // delta, before any Spark job runs
      if (ingestId.exists(
          GenerationalBatches.seenIngestIds(fs, committed).contains)) {
        onStep("committed"); return 0L
      }
      // the door check above validates the batch in ISOLATION; against an
      // existing store also require the same schema, or a funnel store
      // would accept a retention batch (both pass the type gate) and only
      // explode at compact/read time, far from the offending ingest
      committed.sortBy(_._1).lastOption.foreach { case (_, p) =>
        schemaGate(spark, new Path(p, "states"), states)
      }
      appendInto(spark, fs, base, committed, states, stateCol, ingestId,
        onStep)
    }
  }

  /** [[appendStates]] for a GRAIN-PARTITIONED store: the delta is split
    * by `grainCol` (one of `keyCols`) and lands as one batch per grain
    * value under `baseDir/<grainCol>=<value>/` — each grain value a
    * self-contained [[GenerationalBatches]] sub-store. One root lease
    * covers the whole ingest.
    *
    * The write side is ONE Spark job regardless of how many grains the
    * delta spans: the delta is staged with a partitioned write into a
    * hidden `.ingest-*` dir under the store root, then each staged
    * partition is RENAMED into its grain's next batch dir,
    * footer-verified against a per-grain count from the same scan, and
    * marker-committed — a 365-day backfill costs one job plus 365
    * renames, not 365 filtered scans of the delta. The stage partitions
    * on a HEX encoding of the grain string so any value round-trips
    * through the directory name (Spark's own partition escaping never
    * has to agree with the store's); the data files keep every original
    * column. A crash leaves the stage dir hidden and unreadable (reads
    * list only visible `<col>=` dirs); the next ingest sweeps it.
    *
    * The replay guard is per grain: a crash mid-ingest commits some
    * grains and not others, and the redelivery then skips the committed
    * grains and lands only the missing ones — exactly-once per grain,
    * hence exactly-once overall. Returns the rows newly appended (0 on a
    * full replay). */
  def appendStatesByGrain(states: DataFrame, baseDir: String,
      keyCols: Seq[String], grainCol: String, stateCol: String = "state",
      ingestId: Option[String] = None,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    appendStatesByGrain(states, baseDir, keyCols, grainCol, stateCol,
      ingestId, _ => (), leaseStaleMs)

  private[graft] def appendStatesByGrain(states: DataFrame, baseDir: String,
      keyCols: Seq[String], grainCol: String, stateCol: String,
      ingestId: Option[String], onStep: String => Unit,
      leaseStaleMs: Long): Long = {
    requireStateBatch(states, keyCols, stateCol)
    require(keyCols.contains(grainCol),
      s"grain column $grainCol must be one of the key columns $keyCols")
    requireValidIngestId(ingestId)
    val spark = states.sparkSession
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      sweepStageDirs(fs, base, ".ingest-")
      val cached = states.persist()
      try {
        // ONE aggregate scan of the delta yields the NULL gates, the
        // grain inventory, and the per-grain row counts the footer
        // verification checks against — O(grains) driver rows, which the
        // ingest cadence bounds
        val stats = cached.groupBy(col(grainCol).cast("string").as("g"))
          .agg(count(lit(1)).as("n"),
            sum(when(col(stateCol).isNull, 1L).otherwise(0L)).as("nulls"))
          .collect()
        val nullGrains = stats.filter(_.isNullAt(0)).map(_.getLong(1)).sum
        require(nullGrains == 0,
          s"$nullGrains NULL $grainCol rows; a NULL grain names no " +
            "partition — filter placeholder rows before ingest")
        val nullStates = stats.map(_.getLong(2)).sum
        require(nullStates == 0,
          s"$nullStates NULL $stateCol rows; the *_state producers never " +
            "emit NULL — filter placeholder rows before ingest")
        val counts = stats.filter(!_.isNullAt(0))
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        if (counts.isEmpty) { onStep("committed"); return 0L }
        require(!counts.contains(""),
          "empty-string grain value names no directory — filter or " +
            "re-encode placeholder rows before ingest")
        val grains = counts.keys.toSeq.sorted
        onStep("recovered")
        // cross-grain schema gate against the newest existing batch of any
        // grain — one store holds one state family at one layout
        latestBatchAcrossGrains(fs, base).foreach(p =>
          schemaGate(spark, new Path(p, "states"), states))
        // per-grain replay guard BEFORE the write: already-committed
        // grains never re-enter the job
        val pending = grains.filter { g =>
          val gdir = new Path(base, grainDirName(grainCol, g))
          !ingestId.exists(GenerationalBatches
            .seenIngestIds(fs, GenerationalBatches.recover(fs, gdir))
            .contains)
        }
        if (pending.isEmpty) { onStep("committed-all"); return 0L }
        // ONE partitioned write stages every pending grain's rows
        val stage = new Path(base,
          s".ingest-${java.util.UUID.randomUUID()}")
        val delta =
          if (pending.size == grains.size) cached
          else cached.filter(
            col(grainCol).cast("string").isin(pending: _*))
        delta.withColumn(StageHexCol, hex(col(grainCol).cast("string")))
          .write.partitionBy(StageHexCol).parquet(stage.toString)
        onStep("staged")
        val conf = spark.sessionState.newHadoopConf()
        var appended = 0L
        for (g <- pending) {
          val gdir = new Path(base, grainDirName(grainCol, g))
          // recover again at commit time: batch numbering must see any
          // crashed-dir cleanup recover() performs
          val committed = GenerationalBatches.recover(fs, gdir)
          val k = committed.map(_._1).maxOption.map(_ + 1).getOrElse(0L)
          val batchPath = new Path(gdir, s"batch_$k")
          val dataPath = new Path(batchPath, "states")
          fs.mkdirs(batchPath)
          val part = new Path(stage, s"$StageHexCol=${hexOf(g)}")
          require(fs.exists(part),
            s"staged partition missing for grain '$g' ($part)")
          if (!fs.rename(part, dataPath))
            throw new java.io.IOException(
              s"could not move staged grain '$g' into $dataPath")
          val written = graft.sources.Sinks.parquetRowCount(fs, dataPath,
            conf)
          require(written == counts(g),
            s"grain '$g' wrote $written of ${counts(g)} staged rows; " +
              s"batch_$k left uncommitted")
          onStep("written")
          GenerationalBatches.commit(fs, batchPath, Seq.empty,
            ingestId.toSet)
          onStep("committed")
          appended += written
        }
        fs.delete(stage, true)
        onStep("committed-all")
        appended
      } finally cached.unpersist()
    }
  }

  /** Stage-dir partition column for the grained one-job ingest/compact:
    * hex of the grain string, so the stage directory names are [0-9A-F]
    * on both the writer and the lookup side. */
  private val StageHexCol = "__graft_grain_hex"

  private def hexOf(v: String): String =
    v.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** Delete hidden stage dirs (`.ingest-*` / `.compact-*`) a crashed
    * earlier maintenance run left behind — hygiene under the lease, like
    * dropGrainsWhere's tombstone sweep. Never served either way: readers
    * list only visible `<col>=` grain dirs. */
  private def sweepStageDirs(fs: FileSystem, base: Path,
      prefix: String): Unit =
    if (fs.exists(base))
      fs.listStatus(base).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, true))

  /** Fold every committed batch into ONE batch with ONE row per key: the
    * partials of each key combined state-to-state via `combine` (the
    * family's combine twin, e.g.
    * `BehavioralFunctions.funnel_state_combine`). Pure maintenance — any
    * downstream merge reads the same event multiset before and after
    * (the combine twins' associativity). Verified before commit: the
    * written files' footer row count must equal the fold's own row count
    * (one row per key, by construction of the groupBy). Ingest ids of
    * the folded batches are carried into the compacted batch, so the
    * replay guard survives the fold. Crash-ordering and `onStep` seam as
    * in `IncrementalSession.compactBatches` (recovered / written /
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
      foldDir(spark, fs, base, keyCols.map(col), combine, stateCol,
        targetPartitions, onStep)
    }
  }

  /** RANGE compaction for a grain-partitioned store: fold only the grain
    * values `grains` selects (default: all), under ONE root lease.
    * Untouched grains' files are left byte-identical — compact is
    * O(touched grains), not O(store), so a year of daily grains stays
    * maintainable by compacting only the days the last ingest touched.
    *
    * Like the ingest, the fold is ONE Spark job regardless of how many
    * grains it touches: one multi-path scan of every selected grain's
    * live batches, one groupBy (the grain key is in the data, so groups
    * can never mix grains), staged with a partitioned write into a
    * hidden `.compact-*` dir, then per grain rename + footer verify +
    * marker commit (folded dirs recorded, ingest ids carried) + cleanup
    * — compacting a 365-grain backfill costs one job plus 365 renames,
    * not 365 fold jobs. A crash mid-commit leaves some grains compacted
    * and the rest intact with their stage hidden; the next maintenance
    * run sweeps and re-folds only what's still unfolded. Returns the
    * total compacted row count. */
  def compactGrains(spark: SparkSession, baseDir: String,
      keyCols: Seq[String], combine: Column => Column,
      stateCol: String = "state", grains: String => Boolean = _ => true,
      targetPartitions: Int = 32,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    compactGrains(spark, baseDir, keyCols, combine, stateCol, grains,
      targetPartitions, _ => (), leaseStaleMs)

  private[graft] def compactGrains(spark: SparkSession, baseDir: String,
      keyCols: Seq[String], combine: Column => Column, stateCol: String,
      grains: String => Boolean, targetPartitions: Int,
      onStep: String => Unit, leaseStaleMs: Long): Long = {
    require(targetPartitions > 0,
      s"targetPartitions must be positive, got $targetPartitions")
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      sweepStageDirs(fs, base, ".compact-")
      val targets = listGrainDirs(fs, base)
        .filter { case (v, _) => grains(v) }.sortBy(_._1)
      onStep("selected")
      // mutating recovery per selected grain (crashed-dir cleanup), and
      // the live batches each grain's fold replaces
      val perGrain = targets
        .map { case (g, gdir) =>
          (g, gdir, GenerationalBatches.recover(fs, gdir).sortBy(_._1)) }
        .filter { case (_, _, committed) => committed.nonEmpty }
      onStep("recovered")
      if (perGrain.isEmpty) return 0L
      val grainCol = targets.head._2.getName.split("=", 2)(0)
      // ONE multi-path scan and ONE shuffle fold every selected grain —
      // the grain key is one of the group keys, so groups cannot mix
      // grains; the repartition bounds files per grain at
      // targetPartitions while keeping the write parallel
      val allPaths = perGrain.flatMap { case (_, _, committed) =>
        committed.map { case (_, p) => new Path(p, "states").toString } }
      val folded = spark.read.parquet(allPaths: _*)
        .groupBy(keyCols.map(col): _*)
        .agg(combine(col(stateCol)).as(stateCol))
        .repartition(targetPartitions, keyCols.map(col): _*)
        .persist()
      try {
        val counts = folded
          .groupBy(col(grainCol).cast("string").as("g")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val stage = new Path(base,
          s".compact-${java.util.UUID.randomUUID()}")
        folded.withColumn(StageHexCol, hex(col(grainCol).cast("string")))
          .write.partitionBy(StageHexCol).parquet(stage.toString)
        onStep("staged")
        val conf = spark.sessionState.newHadoopConf()
        var total = 0L
        for ((g, gdir, committed) <- perGrain) {
          val k = committed.last._1 + 1
          val batchPath = new Path(gdir, s"batch_$k")
          val dataPath = new Path(batchPath, "states")
          fs.mkdirs(batchPath)
          val part = new Path(stage, s"$StageHexCol=${hexOf(g)}")
          require(fs.exists(part),
            s"staged fold missing for grain '$g' ($part)")
          if (!fs.rename(part, dataPath))
            throw new java.io.IOException(
              s"could not move staged fold for grain '$g' into $dataPath")
          val written = graft.sources.Sinks.parquetRowCount(fs, dataPath,
            conf)
          require(written == counts(g),
            s"grain '$g' compaction wrote $written of ${counts(g)} " +
              s"folded rows; batch_$k left uncommitted, batches intact")
          onStep("written")
          GenerationalBatches.commit(fs, batchPath,
            committed.map(_._2.getName),
            GenerationalBatches.seenIngestIds(fs, committed))
          onStep("committed")
          committed.foreach { case (_, p) => fs.delete(p, true) }
          onStep("cleaned")
          total += written
        }
        fs.delete(stage, true)
        total
      } finally folded.unpersist()
    }
  }

  /** REWRITE the store at a coarser grain, in place: every committed
    * batch folds into one batch keyed by `keyCols` with `grainCol`
    * replaced by `newGrain` (named `newGrainCol`) — e.g.
    * `regrain(…, "day", date_trunc("week", col("day")), "week",
    * funnel_state_combine)` turns a per-(user, day) store into a
    * per-(user, week) one. Same marker/lease cycle and footer
    * verification as [[compact]]; exactness is the same associativity
    * argument (a re-grain is a fold whose groups are coarser — the
    * merged event multiset per user is unchanged, which RegrainSpec pins
    * per family and q122 pins against the raw-scan oracle). Subsequent
    * ingest must use the NEW key set — the schema gate enforces it.
    * Flat stores only: a grain-partitioned store's grain lives in its
    * directory layout, so rewriting it in place would need a multi-dir
    * atomic swap the commit protocol doesn't have — use [[regrainInto]],
    * which folds into a FRESH grained store instead. */
  def regrain(spark: SparkSession, baseDir: String, keyCols: Seq[String],
      grainCol: String, newGrain: Column, newGrainCol: String,
      combine: Column => Column, stateCol: String = "state",
      targetPartitions: Int = 32,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    regrain(spark, baseDir, keyCols, grainCol, newGrain, newGrainCol,
      combine, stateCol, targetPartitions, _ => (), leaseStaleMs)

  private[graft] def regrain(spark: SparkSession, baseDir: String,
      keyCols: Seq[String], grainCol: String, newGrain: Column,
      newGrainCol: String, combine: Column => Column, stateCol: String,
      targetPartitions: Int, onStep: String => Unit,
      leaseStaleMs: Long): Long = {
    require(keyCols.contains(grainCol),
      s"grain column $grainCol must be one of the key columns $keyCols")
    require(!keyCols.filterNot(_ == grainCol).contains(newGrainCol) &&
        newGrainCol != stateCol,
      s"new grain column $newGrainCol collides with an existing column")
    require(targetPartitions > 0,
      s"targetPartitions must be positive, got $targetPartitions")
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    val groupCols = keyCols.map(kc =>
      if (kc == grainCol) newGrain.as(newGrainCol) else col(kc))
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      foldDir(spark, fs, base, groupCols, combine, stateCol,
        targetPartitions, onStep)
    }
  }

  /** Re-grain a GRAIN-PARTITIONED store by folding it into a FRESH
    * grained store at the coarser grain: `day=…` sub-stores become
    * `week=…` sub-stores under `dstDir`, each key's partials combined
    * with the family's combine twin — the in-place [[regrain]] for
    * stores whose grain lives in the directory layout (where an in-place
    * rewrite would need a multi-dir atomic swap the per-sub-store commit
    * protocol can't give; a fresh store needs no swap at all). The
    * source is only READ — retire it with its own [[dropGrainsWhere]]
    * (or delete the dir) once the destination is verified.
    *
    * Crash safety is [[appendStatesByGrain]]'s per-grain replay guard:
    * the whole rewrite lands under ONE `ingestId` (default
    * `"regrain-into"`), so a rerun after a crash skips the new grains
    * that already committed and lands only the missing ones —
    * exactly-once per grain with no coordination beyond the id. The
    * default id therefore assumes `dstDir` is DEDICATED to this rewrite
    * (a fresh store); pass a distinct id per rewrite when layering
    * several sources into one destination, or the second rewrite is
    * silently absorbed by the guard. Exactness is the same associativity
    * argument as [[regrain]] (GrainedRollupStoreSpec pins the
    * differential and the crash-resume). Returns the rows written into
    * the destination (0 on a full replay). */
  def regrainInto(spark: SparkSession, srcDir: String, dstDir: String,
      keyCols: Seq[String], grainCol: String, newGrain: Column,
      newGrainCol: String, combine: Column => Column,
      stateCol: String = "state",
      ingestId: Option[String] = Some("regrain-into"),
      targetPartitions: Int = 32,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Long =
    regrainInto(spark, srcDir, dstDir, keyCols, grainCol, newGrain,
      newGrainCol, combine, stateCol, ingestId, targetPartitions, _ => (),
      leaseStaleMs)

  private[graft] def regrainInto(spark: SparkSession, srcDir: String,
      dstDir: String, keyCols: Seq[String], grainCol: String,
      newGrain: Column, newGrainCol: String, combine: Column => Column,
      stateCol: String, ingestId: Option[String], targetPartitions: Int,
      onStep: String => Unit, leaseStaleMs: Long): Long = {
    require(new Path(srcDir) != new Path(dstDir),
      s"regrainInto must fold into a FRESH store, not $srcDir itself")
    require(keyCols.contains(grainCol),
      s"grain column $grainCol must be one of the key columns $keyCols")
    require(!keyCols.filterNot(_ == grainCol).contains(newGrainCol) &&
        newGrainCol != stateCol,
      s"new grain column $newGrainCol collides with an existing column")
    val foldKeys = keyCols.map(kc =>
      if (kc == grainCol) newGrain.as(newGrainCol) else col(kc))
    val folded = readGrains(spark, srcDir)
      .groupBy(foldKeys: _*)
      .agg(combine(col(stateCol)).as(stateCol))
      .repartition(targetPartitions)
    appendStatesByGrain(folded, dstDir,
      keyCols.map(kc => if (kc == grainCol) newGrainCol else kc),
      newGrainCol, stateCol, ingestId, onStep, leaseStaleMs)
  }

  /** Retire whole grains from a grain-partitioned store: every grain
    * value `drop` selects vanishes ATOMICALLY (the grain dir is renamed
    * to a hidden tombstone — readers listing the store never see a
    * half-deleted grain — then deleted). This is the retention knob that
    * keeps years of daily ingest bounded: state older than the
    * dashboard's horizon stops costing storage, listing, and compaction.
    * Dropping a grain is a DELIBERATE answer change (those days' events
    * leave every merge), which is the point. It also forgets ingest ids
    * recorded only in the dropped grains; the replay guard covers
    * delivery restarts, which replay only their most recent batch — by
    * construction in recent grains. Returns the number of grains
    * dropped. */
  def dropGrainsWhere(spark: SparkSession, baseDir: String,
      drop: String => Boolean,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Int = {
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    graft.sources.Sinks.withSingleWriterLease(fs,
      GenerationalBatches.leasePath(base), leaseStaleMs) {
      // sweep tombstones a crashed earlier drop left behind (hidden, so
      // never served — this is hygiene, not correctness)
      if (fs.exists(base))
        fs.listStatus(base).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(".dropped-"))
          .foreach(st => fs.delete(st.getPath, true))
      val targets = listGrainDirs(fs, base)
        .filter { case (v, _) => drop(v) }.sortBy(_._1)
      targets.foreach { case (_, gdir) =>
        val tomb = new Path(base,
          s".dropped-${java.util.UUID.randomUUID()}-${gdir.getName}")
        if (!fs.rename(gdir, tomb))
          throw new java.io.IOException(s"could not retire grain $gdir")
        fs.delete(tomb, true)
      }
      targets.size
    }
  }

  /** [[dropGrainsWhere]] with the common predicate: drop every grain
    * whose STRING value sorts before `olderThan` — exact for ISO dates
    * (`day=2024-01-05`) and any zero-padded encoding. */
  def dropGrains(spark: SparkSession, baseDir: String, olderThan: String,
      leaseStaleMs: Long = graft.sources.Sinks.DefaultLeaseStaleMs): Int =
    dropGrainsWhere(spark, baseDir, _ < olderThan, leaseStaleMs)

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
      .map { case (_, p) => new Path(p, "states") }
    require(dirs.nonEmpty, s"no committed state batches under $baseDir")
    readStateDirs(spark, fs, dirs, snapshot)
  }

  /** [[read]] for a grain-partitioned store, PRUNED at listing time:
    * only grain values `grains` selects contribute files to the scan
    * (default: all) — a dashboard query over one week never lists, opens,
    * or schedules the other grains' files (PlanSpec pins the scan's
    * input-file set). Same laziness/snapshot contract as [[read]]. */
  def readGrains(spark: SparkSession, baseDir: String,
      grains: String => Boolean = _ => true,
      snapshot: Boolean = false): DataFrame = {
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    val dirs = listGrainDirs(fs, base)
      .filter { case (v, _) => grains(v) }.sortBy(_._1)
      .flatMap { case (_, gdir) =>
        GenerationalBatches.liveBatches(fs, gdir).sortBy(_._1)
          .map { case (_, p) => new Path(p, "states") }
      }
    require(dirs.nonEmpty,
      s"no committed state batches under $baseDir for the selected grains")
    readStateDirs(spark, fs, dirs, snapshot)
  }

  /** The grain values currently present in a grain-partitioned store,
    * sorted. */
  def grainValues(spark: SparkSession, baseDir: String): Seq[String] = {
    val fs = fsOf(spark, baseDir)
    listGrainDirs(fs, new Path(baseDir)).map(_._1).sorted
  }

  /** Committed, not-yet-folded batch dirs — q118 pins that compaction
    * actually shrinks it. For a grain-partitioned store: summed over all
    * grains. */
  def liveBatchCount(spark: SparkSession, baseDir: String): Int = {
    val fs = fsOf(spark, baseDir)
    val base = new Path(baseDir)
    val grains = listGrainDirs(fs, base)
    if (grains.isEmpty) GenerationalBatches.liveBatches(fs, base).size
    else grains.map { case (_, g) =>
      GenerationalBatches.liveBatches(fs, g).size }.sum
  }

  // ---- shared internals ----------------------------------------------

  /** Column-set and state-type door checks, batch in isolation. */
  private def requireStateBatch(states: DataFrame, keyCols: Seq[String],
      stateCol: String): Unit = {
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
  }

  private def requireValidIngestId(ingestId: Option[String]): Unit =
    ingestId.foreach(id => require(id.nonEmpty && !id.contains('\n'),
      s"ingest id must be non-empty and newline-free: '$id'"))

  /** Incoming batch schema must match the store's (name -> type). */
  private def schemaGate(spark: SparkSession, existingStates: Path,
      states: DataFrame): Unit = {
    val existing = spark.read.parquet(existingStates.toString)
      .schema.map(f => f.name -> f.dataType).toMap
    val incoming = states.schema.map(f => f.name -> f.dataType).toMap
    require(incoming == existing,
      s"state batch schema $incoming does not match the store's " +
        s"$existing; one store holds one state family at one grain")
  }

  /** Write `states` as the next batch under `base` (lease already held):
    * persist, count, NULL-gate, footer-verify, commit with `ingestId`.
    * Returns the appended row count (0 for an empty delta). */
  private def appendInto(spark: SparkSession, fs: FileSystem, base: Path,
      committed: Seq[(Long, Path)], states: DataFrame, stateCol: String,
      ingestId: Option[String], onStep: String => Unit): Long = {
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
      GenerationalBatches.commit(fs, batchPath, Seq.empty, ingestId.toSet)
      onStep("committed")
      n
    } finally cached.unpersist()
  }

  /** Fold all committed batches under `base` into one (lease already
    * held): the compaction/regrain engine. `groupCols` are the output
    * keys; ingest ids are unioned forward. */
  private def foldDir(spark: SparkSession, fs: FileSystem, base: Path,
      groupCols: Seq[Column], combine: Column => Column, stateCol: String,
      targetPartitions: Int, onStep: String => Unit): Long = {
    val committed = GenerationalBatches.recover(fs, base).sortBy(_._1)
    onStep("recovered")
    if (committed.isEmpty) return 0L
    // one multi-path scan of the whole sub-store (not a union chain), and
    // ONE scan only: the fold result is persisted, counted once, and the
    // write is footer-verified against that count — a separate
    // distinct-key pre-scan would double compaction I/O to re-verify
    // what groupBy structurally guarantees (one row per key)
    val all = spark.read.parquet(committed.map { case (_, p) =>
      new Path(p, "states").toString }: _*)
    val k = committed.last._1 + 1
    val batchPath = new Path(base, s"batch_$k")
    val dataPath = new Path(batchPath, "states")
    val folded = all.groupBy(groupCols: _*)
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
    GenerationalBatches.commit(fs, batchPath, committed.map(_._2.getName),
      GenerationalBatches.seenIngestIds(fs, committed))
    onStep("committed")
    committed.foreach { case (_, p) => fs.delete(p, true) }
    onStep("cleaned")
    written
  }

  private def readStateDirs(spark: SparkSession, fs: FileSystem,
      dirs: Seq[Path], snapshot: Boolean): DataFrame =
    if (!snapshot) spark.read.parquet(dirs.map(_.toString): _*)
    else {
      // pin the exact FILES, not the dirs: a compaction committing after
      // this point cannot change what the plan reads (its cleanup could
      // still delete them mid-action — at that point re-read; for true
      // snapshot isolation over object stores use a table format)
      // explicit file paths bypass Spark's default path filter, so apply
      // the same rules here: data files only — no '_' markers/_SUCCESS,
      // no '.'-prefixed hidden/checksum/temp files
      val files = dirs.flatMap { d =>
        fs.listStatus(d).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")
            && !st.getPath.getName.startsWith("_")
            && !st.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      }
      spark.read.parquet(files: _*)
    }

  // ---- grain directory layout ----------------------------------------

  /** `<col>=<escaped value>` — the value percent-encoded so any string
    * round-trips through a single path segment (ISO dates pass through
    * verbatim). */
  private[graft] def grainDirName(grainCol: String, value: String): String =
    s"$grainCol=${escapeGrain(value)}"

  private def escapeGrain(v: String): String =
    v.flatMap { c =>
      if (c.isLetterOrDigit && c < 0x80 || c == '.' || c == '_' || c == '-')
        c.toString
      else c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X")
        .mkString
    }

  private def unescapeGrain(s: String): String = {
    val bytes = new scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        bytes += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
        i += 3
      } else {
        bytes ++= s.charAt(i).toString.getBytes("UTF-8")
        i += 1
      }
    }
    new String(bytes.toArray, "UTF-8")
  }

  /** (unescaped grain value, grain dir) for every grain partition. */
  private def listGrainDirs(fs: FileSystem, base: Path): Seq[(String, Path)] =
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("=")
        && !st.getPath.getName.startsWith("."))
      .map { st =>
        unescapeGrain(st.getPath.getName.split("=", 2)(1)) -> st.getPath
      }

  /** The newest committed batch across every grain of a grained store
    * (None on first ingest) — the cross-grain schema gate's reference. */
  private def latestBatchAcrossGrains(fs: FileSystem,
      base: Path): Option[Path] =
    listGrainDirs(fs, base).sortBy(_._1).reverse.iterator
      .flatMap { case (_, g) =>
        GenerationalBatches.committedBatches(fs, g).sortBy(_._1).lastOption
          .map(_._2)
      }.nextOption()

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
}
