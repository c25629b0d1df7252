package graft.index

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.PageRow

/** Incremental indexing: change detection + delta generations.
  *
  * The reference's incremental machinery is cost-ordered change
  * probes with a tri-state result
  * (/root/reference/packages/core/spheraform_core/adapters/base.py:171-199)
  * feeding selective re-downloads. Our equivalent: a `warc_ts`
  * high-watermark selects only appended pages (≙ Iceberg incremental
  * snapshot read at scale), a delta index generation is built over
  * them with docIds continuing above the base generation, and
  * [[graft.query.Searcher.searchMulti]] answers queries over the union
  * rank-identically to a full rebuild — block bounds are derived from
  * (maxTf, minDl) under CURRENT combined stats, so WAND stays exact
  * as N, avgdl, and df move.
  *
  * Constraint (append-only): generations must be url-disjoint; a
  * re-crawled url needs a compaction pass, not a delta.
  */
object Incremental {

  /** The base generation's ingestion watermark, persisted beside its
    * stats (written by [[buildDelta]] and [[watermarkOf]] callers).
    */
  def readWatermark(spark: SparkSession, indexDir: String): Option[Timestamp] =
    if (!IndexPaths.exists(spark, s"$indexDir/watermark.json")) None
    else Some(Timestamp.valueOf(IndexPaths.parseFlatJson(
      IndexPaths.readString(spark, s"$indexDir/watermark.json"))("maxWarcTs")))

  def writeWatermark(spark: SparkSession, indexDir: String,
                     ts: Timestamp): Unit =
    IndexPaths.writeString(spark, s"$indexDir/watermark.json",
      s"""{"maxWarcTs":"$ts"}""")

  /** Change detection: pages strictly newer than the watermark. */
  def newPages(pages: Dataset[PageRow],
               watermark: Option[Timestamp]): Dataset[PageRow] =
    watermark match {
      case Some(w) => pages.filter(col("warc_ts") > lit(w))
      case None    => pages
    }

  /** Build a delta generation over `pages` (pre-filtered to new rows),
    * numbering docIds above the base generations' maxDocId. Returns
    * the delta's stats.
    */
  def buildDelta(pages: Dataset[PageRow], baseDirs: Seq[String],
                 deltaDir: String, cfg: IndexBuilder.Config,
                 buildId: String = "delta",
                 useExtractor: Boolean = true): IndexStats = {
    val spark = pages.sparkSession
    val baseMax = baseDirs.map(d =>
      IndexPaths.readStats(spark, d).maxDocId).max
    val docs = DocIds.fromPages(pages,
      spark.sessionState.conf.numShufflePartitions,
      useExtractor = useExtractor, offset = baseMax + 1)
    val stats = IndexBuilder.build(docs, deltaDir, cfg, buildId,
      lineage = s"delta-over(${baseDirs.mkString(",")})")
    val maxTs = pages.agg(max(col("warc_ts"))).head().getTimestamp(0)
    if (maxTs != null) writeWatermark(spark, deltaDir, maxTs)
    stats
  }
}
