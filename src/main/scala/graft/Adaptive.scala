package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive shuffle sizing for operators that MATERIALIZE their
  * result internally (the dedup pipeline, the engine's scatter/gather
  * serve, chunked exports): the session-level
  * `spark.sql.shuffle.partitions` is a cluster-scale constant, and
  * planning a near-empty shuffle at that width buys nothing but
  * per-task scheduling floors (measured: dedup queries at sf0.1 run
  * 400-700 near-empty tasks whose launch overhead dominates wall
  * time). The width here is derived from the INPUT (optimizer size
  * estimate, or an exact key cardinality the caller knows) and clamped
  * at the session setting — at 100 TB the estimate exceeds the clamp
  * and the session width wins unchanged, so this can only remove
  * waste, never cap a big job.
  *
  * Same session-conf scoping discipline as [[pipeline.Dedup.clusters]]
  * and [[Streaming.sessionize]] (restore in `finally`; the engine's
  * contract surfaces are single-threaded per session — a shared-
  * session deployment wraps operators in their own session).
  */
object Adaptive {

  /** Run `body` with `spark.sql.shuffle.partitions` clamped to
    * min(session setting, `target`) (floor 1). A non-numeric platform
    * setting (e.g. "auto") skips the clamp. `body` must consume every
    * plan it creates — a lazily returned plan would execute at the
    * RESTORED width.
    */
  def withShuffleWidth[T](spark: SparkSession, target: Long)(body: => T): T =
    withShuffleWidth(spark, target, disableAqeWhenClamped = false)(body)

  /** As above; `disableAqeWhenClamped` additionally turns AQE off for
    * the scope WHEN the clamp engages (small input): with the width
    * already right-sized there is nothing left for AQE to adapt, and
    * its per-exchange query-stage jobs (one driver round-trip per
    * materialized stage) dominate small-input operators — the
    * [[pipeline.Dedup.clusters]] loop rule. At scale the clamp does
    * not engage and AQE stays on untouched.
    */
  def withShuffleWidth[T](spark: SparkSession, target: Long,
                          disableAqeWhenClamped: Boolean)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev.toLongOption match {
      case Some(p) if target < p =>
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        try {
          spark.conf.set("spark.sql.shuffle.partitions",
            math.max(1L, target).toString)
          if (disableAqeWhenClamped)
            spark.conf.set("spark.sql.adaptive.enabled", "false")
          body
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        }
      case _ => body
    }
  }

  /** Shuffle-width estimate for a pipeline over `df`: one partition
    * per `bytesPerPartition` of the optimizer's size estimate for the
    * input, floored at `minParts` (cheap parallelism insurance for
    * compute-dense downstream stages — pair generation does m² work on
    * m rows). The estimate errs large for derived columns, which only
    * moves the width TOWARD the session cap — safe in both directions.
    */
  def widthFor(df: DataFrame, bytesPerPartition: Long = 2L << 20,
               minParts: Long = 4L): Long = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts =
      if (!bytes.isValidLong) Long.MaxValue
      else bytes.toLong / math.max(1L, bytesPerPartition) + 1L
    math.max(minParts, parts)
  }
}
