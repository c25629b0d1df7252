package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Checkpoint, CheckpointStore, IndexPaths}
import graft.query.Searcher

/** Bulk retrieval: materialize a hit set (index-served conjunctive
  * query, or a filtered corpus slice) WITH its text to parquet files —
  * the reference's ExportJob surface
  * (/root/reference/packages/core/spheraform_core/models/job.py:177-239:
  * format enum, chunked progress, resumability). The serve path stops
  * at top-k rows; this is the "give me every matching document" path.
  *
  * Scale shape: the hit set is a distributed Dataset end to end
  * ([[Searcher.conjunctiveDocs]] — posting-list AND, never a driver
  * collect), text joins back by url as a plain shuffle join, and the
  * output is written in `chunks` docId-hash chunks, each committed in
  * the build's CheckpointStore — a crashed export resumes at the first
  * incomplete chunk instead of restarting (reference: resumable chunk
  * ladder, models/job.py:115-167).
  */
object Export {

  case class ExportResult(rows: Long, chunks: Int, skipped: Int)

  /** Export every doc matching ALL query terms, with url + text joined
    * back from the source corpus. Output: `outDir/chunk=i/` parquet
    * (doc_id, url, text) plus `manifest.json` on completion.
    */
  def dumpQuery(spark: SparkSession, indexDirs: Seq[String],
                query: String, srcDocs: DataFrame,
                outDir: String, chunks: Int = 8,
                resume: Boolean = true): ExportResult = {
    import spark.implicits._
    val nChunks = math.max(1, chunks)
    val ckpt = new CheckpointStore(spark, outDir)
    // resume is only valid for the SAME query and chunking: chunk
    // checkpoints are keyed by index alone, so without this a re-run
    // with a different query into the same outDir would skip every
    // chunk and serve the old query's rows under the new manifest
    val lineage = s"export;chunks=$nChunks;q=${tag(query)}"
    if (resume && ckpt.invalidateUnlessLineage(lineage))
      deleteChunks(spark, outDir)
    val t0 = System.currentTimeMillis()
    val ids = Searcher.conjunctiveDocs(spark, indexDirs, query)
      .toDF("docId")
    val meta = indexDirs.map(d => spark.read.parquet(s"$d/docs")
        .select(col("docId"), col("url")))
      .reduce(_ unionByName _)
    val rows = ids.join(meta, "docId")
      .join(srcDocs.select(col("url"), col("text")), "url")
      .select(col("docId").as("doc_id"), col("url"), col("text"))
      .withColumn("chunk", pmod(xxhash64(col("doc_id")), lit(nChunks)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var total = 0L
      var skipped = 0
      (0 until nChunks).foreach { c =>
        if (resume && ckpt.isComplete("export", c)) {
          skipped += 1
          total += spark.read.parquet(s"$outDir/chunk=$c").count()
        } else {
          // row count observed during the write — no re-read job
          val obs = new org.apache.spark.sql.Observation()
          rows.filter(col("chunk") === c).drop("chunk")
            .observe(obs, count(lit(1)).as("n"))
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/chunk=$c")
          val n = obs.get("n").asInstanceOf[Long]
          total += n
          ckpt.commit(Checkpoint("export", "export", c, "COMPLETE", n,
            IndexPaths.dirBytes(spark, s"$outDir/chunk=$c"),
            lineage, t0, System.currentTimeMillis()))
        }
      }
      IndexPaths.writeString(spark, s"$outDir/manifest.json",
        s"""{"rows":$total,"chunks":$nChunks,"query":${jsonStr(query)}}""")
      ExportResult(total, nChunks, skipped)
    } finally rows.unpersist()
  }

  /** Export a filtered corpus slice (no index involved): predicate
    * pushdown straight to the source scan, same chunked commit.
    */
  def dumpFilter(spark: SparkSession, srcDocs: DataFrame,
                 predicate: org.apache.spark.sql.Column,
                 outDir: String, chunks: Int = 8,
                 resume: Boolean = true): ExportResult = {
    val nChunks = math.max(1, chunks)
    val ckpt = new CheckpointStore(spark, outDir)
    // Column.toString is a stable render of the expression tree —
    // enough to fence resumes against a different predicate/chunking
    val lineage = s"export_f;chunks=$nChunks;p=${tag(predicate.toString)}"
    if (resume && ckpt.invalidateUnlessLineage(lineage))
      deleteChunks(spark, outDir)
    val t0 = System.currentTimeMillis()
    val rows = srcDocs.filter(predicate)
      .withColumn("chunk",
        pmod(xxhash64(col("url")), lit(nChunks)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var total = 0L
      var skipped = 0
      (0 until nChunks).foreach { c =>
        if (resume && ckpt.isComplete("export_f", c)) {
          skipped += 1
          total += spark.read.parquet(s"$outDir/chunk=$c").count()
        } else {
          val obs = new org.apache.spark.sql.Observation()
          rows.filter(col("chunk") === c).drop("chunk")
            .observe(obs, count(lit(1)).as("n"))
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/chunk=$c")
          val n = obs.get("n").asInstanceOf[Long]
          total += n
          ckpt.commit(Checkpoint("export", "export_f", c, "COMPLETE", n,
            IndexPaths.dirBytes(spark, s"$outDir/chunk=$c"),
            lineage, t0, System.currentTimeMillis()))
        }
      }
      IndexPaths.writeString(spark, s"$outDir/manifest.json",
        s"""{"rows":$total,"chunks":$nChunks}""")
      ExportResult(total, nChunks, skipped)
    } finally rows.unpersist()
  }

  /** Deterministic short fingerprint for lineage fields — checkpoint
    * JSON is flat-parsed, so raw query/predicate text (quotes, commas)
    * must never be embedded verbatim.
    */
  private def tag(s: String): String =
    java.util.UUID.nameUUIDFromBytes(s.getBytes("UTF-8")).toString

  /** Remove every chunk=* dir of a previous incompatible export: a
    * smaller new chunk count would otherwise leave orphan chunk dirs a
    * globbing consumer would read alongside the new ones.
    */
  private def deleteChunks(spark: SparkSession, outDir: String): Unit = {
    val f = IndexPaths.fs(spark, outDir)
    val p = new org.apache.hadoop.fs.Path(outDir)
    if (f.exists(p))
      f.listStatus(p).filter(_.getPath.getName.startsWith("chunk="))
        .foreach(s => f.delete(s.getPath, true))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
