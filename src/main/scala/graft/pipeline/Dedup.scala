package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over a (doc_id, text) corpus — exact,
  * MinHash+LSH, n-gram Jaccard, SimHash. All shuffles are keyed
  * groupBy/joins on content hashes: at 100 TB the exact dedup is one
  * hash-partitioned aggregation, and LSH turns the quadratic pair
  * search into band-bucket joins whose fan-out is bounded by bucket
  * size (hot buckets are the same skew problem as hot terms — same
  * salting story applies).
  */
object Dedup {

  /** Exact dedup groups: fingerprint → group size + keeper (min id). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))
      .orderBy("fp")


  /** All-pairs n-gram Jaccard ≥ threshold via an explode + self-join
    * on shingles (exact; use LSH below when the corpus is large).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"),
        TextOps.shingles(col(textCol)).as("shs"))
      .filter(size(col("shs")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val pairs = sh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val inter = pairs.as("a")
      .join(pairs.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac_r"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH near-dup pairs: numHashes md5-minhashes, banded
    * into `bands`; docs sharing any band become candidates; candidates
    * verified by exact Jaccard ≥ threshold. The band join is the
    * scale path — no all-pairs comparison ever materializes.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int, bands: Int,
                 threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    val rows = numHashes / bands
    val sh = docs
      .select(col(idCol).as("doc_id"),
        TextOps.shingles(col(textCol)).as("shs"))
      .filter(size(col("shs")) > 0)
    sh.cache()
    // Typed minhash: the 16-way md5 Column expression overflows janino
    // codegen (falls back to interpreted, ~10x slower); a mapPartitions
    // with one reused MessageDigest computes identical hex strings.
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val sig = sh.as[(Long, Seq[String])].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String =
        b.map(x => f"$x%02x").mkString
      it.map { case (id, shs) =>
        val mh = Array.tabulate(numHashes) { j =>
          var best: String = null
          shs.foreach { s =>
            md.reset()
            val h = hex(md.digest(s"$j|$s".getBytes("UTF-8")))
            if (best == null || h < best) best = h
          }
          best
        }
        (id, mh.toSeq)
      }
    }.toDF("doc_id", "mh")
    // band value = concatenated minhashes of the band's rows
    val banded = sig.select(col("doc_id"), explode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", (0 until rows).map(r =>
            element_at(col("mh"), b * rows + r + 1)): _*).as("bval"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bval"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard
    val withSets = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac_r"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash per doc (64-bit, hex) — near-dup docs have small hamming
    * distance; downstream bucketing joins on bit-chunks.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text")).as[(Long, String)]
      .map { case (id, text) =>
        val h = TextOps.simhash64(
          graft.functions.Tokenize.tokens(text).toSeq)
        (id, f"$h%016x")
      }
      .toDF("doc_id", "simhash")
      .orderBy("doc_id")
  }
}
