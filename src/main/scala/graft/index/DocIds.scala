package graft.index

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.data.PageRow
import graft.functions.TextExtractor

/** A document entering the index: stable docId + extracted text. */
case class Doc(docId: Long, url: String, text: String)

/** Stable monotonic docID assignment (SURVEY.md §7 "hard parts").
  *
  * docId = global rank of `url` in ascending sort order. This is stable
  * across runs AND across parallelism levels, unlike
  * `monotonically_increasing_id` (partition-layout dependent) — the
  * property rank-identical goldens require.
  *
  * Implementation is the classic two-pass offset scan:
  *  1. `repartitionByRange(url).sortWithinPartitions(url)` — a total
  *     order split into P contiguous ranges (Spark's RangePartitioner
  *     samples deterministically for a given input).
  *  2. count rows per partition (cheap first pass over the cached
  *     sorted data), prefix-sum the counts on the driver (P longs),
  *     then add each partition's offset to its local rank.
  *
  * The per-partition counts/offsets mirror the reference's OID-range
  * chunk computation (/root/reference/packages/core/spheraform_core/adapters/arcgis.py:896-907):
  * an explicit, even split of a global key range across workers.
  */
object DocIds {

  /** Assign docIds to pages; extracts text from html when
    * `useExtractor` (exercising the byte-identical invariant) or
    * trusts the `text` column otherwise.
    */
  def fromPages(pages: Dataset[PageRow], numPartitions: Int,
                useExtractor: Boolean = false,
                offset: Long = 0L): Dataset[Doc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val docs =
      if (useExtractor)
        // native codegen'd expression: scan prunes to (url, html) and
        // extraction runs inside whole-stage codegen (no UDF)
        pages.select(col("url"),
          graft.functions.GraftFunctions.extract_text(col("html"))
            .as("text"))
      else
        pages.select(col("url"), col("text"))
    assign(docs, numPartitions, offset)
  }

  /** Assign docIds to any (url, text) DataFrame-shaped dataset.
    * `offset` starts numbering above an existing generation's
    * maxDocId (incremental append).
    *
    * The rank computation runs on a SKINNY url-only plan — the range
    * partitioner's sampling pass and the sort shuffle move ~60-byte
    * rows, never the document payload (at 100 TB, sampling the full
    * (url, text) corpus would be a second full extraction pass). The
    * payload joins back by url afterwards (one hash shuffle of the
    * text, which any layout change costs anyway).
    */
  def assign(docs: Dataset[org.apache.spark.sql.Row],
             numPartitions: Int = 0, offset: Long = 0L): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val urlsSorted = docs.select(col("url").cast("string"))
      .repartitionByRange(p, col("url"))
      .sortWithinPartitions("url")
      .as[String]
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Ranks are over DISTINCT urls: a crawl batch can capture the same
    // page twice, and without dedup the rank pass would mint one docId
    // per duplicate ROW while the payload join-back cross-products
    // them — duplicate docIds that WAND then double-scores with no
    // error anywhere. Sorted partitions make duplicates adjacent, so
    // both passes dedup with a previous-value compare, for free.
    // Counts accumulate in a Long — Iterator.size returns Int, which
    // silently wraps past 2^31 rows per partition (real at the
    // 10^12-url design point).
    val counts = IndexBuilder.timed("docids-rank")(urlsSorted
      .mapPartitions { it =>
        var n = 0L; var prev: String = null
        it.foreach { u => if (u != prev) { n += 1; prev = u } }
        Iterator.single(n)
      }(Encoders.scalaLong)
      .collect())
    val offsets = counts.scanLeft(offset)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val ids = urlsSorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rank = bc.value(pid)
      var prev: String = null
      it.flatMap { url =>
        if (url == prev) Iterator.empty
        else {
          prev = url; val r = (url, rank); rank += 1; Iterator.single(r)
        }
      }
    }.toDF("url", "docId")
    // Join the payload back, one winner per url: max_by on the content
    // hash is deterministic (tied hashes mean identical text), and the
    // partial aggregate collapses duplicate payloads map-side BEFORE
    // the shuffle — the common exact-duplicate case never ships twice.
    // The groupBy(url) output is hash-partitioned by url, which the
    // join reuses, so the payload still crosses the network once.
    // Cache the result — callers traverse the corpus more than once
    // (tf pass, docs-meta pass).
    val assigned = docs
      .select(col("url").cast("string"), col("text").cast("string"))
      .groupBy("url")
      .agg(max_by(col("text"),
        xxhash64(col("url"), col("text"))).as("text"))
      .join(ids, "url")
      .select(col("docId"), col("url"), col("text"))
      .as[Doc]
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize here so the skinny rank cache can be dropped — it
    // would otherwise stay pinned in executor storage for the
    // application lifetime (one leak per incremental delta)
    assigned.count()
    urlsSorted.unpersist(false)
    assigned
  }
}
