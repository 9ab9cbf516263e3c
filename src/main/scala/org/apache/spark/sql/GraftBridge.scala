package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard pattern for Spark extension libraries (cf. public projects
  * like Qbeast/Sedona exposing package-private factories the same way).
  * Keeps the rest of the codebase in the `graft` package. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — `Dataset.ofRows` is
    * private[sql]; needed to surface custom LogicalPlan nodes. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Stable per-session identity (`classic.SparkSession.sessionUUID` is
    * not surfaced on the abstract API class) — used to key per-session
    * guards. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** The analyzed logical plan under a DataFrame. */
  def planOf(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drain the listener bus — `QueryExecutionListener` callbacks are
    * asynchronous, so plan-capturing tests must flush before
    * asserting (`listenerBus` is `private[spark]`). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** `repartition(n, keys).localCheckpoint()` that KEEPS the hash
    * layout visible to the planner.
    *
    * `Dataset.localCheckpoint` wraps the materialized RDD in a
    * `LogicalRDD` whose `outputPartitioning` comes back
    * `UnknownPartitioning` (measured on this Spark build), so every
    * downstream join/aggregate on the very keys the frame is already
    * clustered by replans an ENSURE_REQUIREMENTS exchange — for an
    * iterative graph loop that is a full O(|E|) reshuffle of the edge
    * frame EVERY round. This helper re-asserts what is physically true:
    * it copies the `LogicalRDD` with
    * `HashPartitioning(keys, n)`, after which equi-joins and
    * aggregates keyed on `keys` plan exchange-free against it.
    *
    * Safety argument (why the assertion cannot lie): the frame is
    * materialized by THIS method via `repartition(n, keys)` with an
    * EXPLICIT partition count — a `REPARTITION_BY_NUM` shuffle that AQE
    * never coalesces or re-sizes — so the checkpointed RDD's layout is
    * exactly `hashpartitioning(keys, n)` by construction. Asserting a
    * layout a frame does not have would silently mis-join; that is why
    * this method owns the repartition instead of trusting the caller's.
    *
    * Storage: plain eager `localCheckpoint()` (deserialized) — the
    * working-frame policy for iterative loops (see
    * [[graft.operators.Curation]] storage notes). */
  def localCheckpointHashPartitioned(df: DataFrame, n: Int,
      keys: String*): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    val ck = df.repartition(n, keys.map(df.col): _*).localCheckpoint()
    val lr = ck.queryExecution.analyzed match {
      case l: LogicalRDD => l
      case other => throw new IllegalStateException(
        s"localCheckpoint did not produce a LogicalRDD: $other")
    }
    val attrs = keys.map { k =>
      lr.output.find(_.name == k).getOrElse(throw new IllegalArgumentException(
        s"column $k not in ${lr.output.map(_.name).mkString(",")}"))
    }
    val fixed = lr.copy(outputPartitioning = HashPartitioning(attrs, n))(
      ck.sparkSession.asInstanceOf[classic.SparkSession], None, None)
    ofRows(ck.sparkSession, fixed)
  }

  /** Cached bytes (memory + disk) behind a `localCheckpoint`ed frame,
    * read from driver-side BlockManager metadata — a FREE size probe:
    * deciding a size-gated code path with `df.count()` costs a full
    * scan of the cached frame per invocation (measured seconds per rep
    * on the ×10 co-purchase edge list), while the storage info is
    * already on the driver the moment the eager checkpoint returns. */
  def checkpointStorageBytes(df: DataFrame): Long = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    // Fail LOUDLY on the unknown-size cases instead of returning 0:
    // callers size-gate on this value and 0 reads as "small", which is
    // the unsafe direction — a not-yet-checkpointed frame or evicted
    // blocks would arm small-graph levers (chained broadcasts, AQE
    // off) on a graph of unknown size.
    require(rdds.nonEmpty,
      "checkpointStorageBytes: frame has no LogicalRDD — call it on an " +
        "eagerly localCheckpoint()ed frame, not an arbitrary plan")
    val ids = rdds.map(_.id).toSet
    val infos = df.sparkSession.sparkContext.getRDDStorageInfo
      .filter(i => ids.contains(i.id))
    // An EMPTY checkpoint (0 partitions, e.g. AQE-coalesced empty
    // frame) legitimately stores no blocks — size 0 is the truth, not
    // an unknown. A checkpoint reporting FEWER cached partitions than
    // the RDDs hold (including zero) is the unknown case: blocks
    // evicted under memory pressure between the eager checkpoint and
    // this probe — a PARTIAL eviction would otherwise under-report and
    // could mis-arm a size-gated caller's small path. Report
    // Long.MaxValue so such callers take the BIG-graph path — same
    // safety direction as failing (small-graph levers never arm on an
    // unknown size) but the job survives, degrading to the all-shuffle
    // plan instead of aborting. The exception above stays reserved for
    // the no-LogicalRDD misuse case.
    val totalParts = rdds.map(_.getNumPartitions.toLong).sum
    val cachedParts = infos.map(_.numCachedPartitions.toLong).sum
    if (cachedParts < totalParts) Long.MaxValue
    else infos.map(i => i.memSize + i.diskSize).sum
  }

  /** Actually free a `localCheckpoint`ed frame's pinned blocks.
    *
    * `Dataset.unpersist()` only consults the `CacheManager`, which
    * knows nothing about checkpoint RDDs — measured on this Spark
    * build: after `df.localCheckpoint(); df.unpersist(true)` the RDD
    * still sits in `sc.getPersistentRDDs` at full storage level. The
    * blocks ARE eventually dropped by the ContextCleaner when the JVM
    * garbage-collects the RDD handle, but an iterative loop that pins
    * a shrinking O(|E|) copy per round cannot wait for GC weather —
    * at the ×100 tier that nondeterminism is the difference between
    * fitting and spilling. This walks the plan for `LogicalRDD`
    * leaves and unpersists their RDDs directly (non-blocking; the
    * block manager drops asynchronously).
    *
    * CONTRACT: the checkpoint truncated lineage, so a released frame
    * (and any projection sharing its RDD) must never be read again. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
