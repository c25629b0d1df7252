package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, a window-ranked
  * kNN join, and a random-hyperplane LSH-bucketed approximate path —
  * the scale story (bucket first, rerank within bucket: candidate set
  * shrinks by 2^planes, and buckets are independent partitions).
  */
object Similarity {

  /** Cosine similarity between two array columns, computed in double
    * with codegen'd higher-order functions (no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k by cosine vs one query vector (excluded from
    * results). Output ordered by (rounded cosine desc, id asc) so
    * cross-engine double ulp differences cannot reorder rows.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val qArr = array(q.map(v => lit(v)): _*)
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol), qArr), 4).as("cos_r"))
      .orderBy(desc("cos_r"), col(idCol))
      .limit(k)
  }

  /** kNN join: for each query vector (id < numQueries), its top-k
    * neighbors by cosine — broadcast the small query side, window-rank
    * per query.
    */
  def knnJoin(emb: DataFrame, idCol: String, vecCol: String,
              numQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = emb.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos_r"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cos_r"), col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d) in [-1, 1) — derived from counter-based hashing, so the
    * same planes exist on every executor with no shared state.
    */
  def planeComponent(seed: Long, j: Int, d: Int): Double =
    Det.unit(Det.h(seed, j.toLong * 100003L + d, 5L)) * 2.0 - 1.0

  /** LSH-bucketed approximate NN: sign-bucket every vector by
    * `numPlanes` random hyperplanes, then exact-rerank only within the
    * query vector's bucket. Approximate by construction (recall < 1) —
    * validated by recall tests, not an equality oracle.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int = 8,
              seed: Long = 42L): DataFrame = {
    val dims = emb.select(size(col(vecCol))).head().getInt(0)
    def bucketCol(vec: Column): Column = {
      val bits = (0 until numPlanes).map { j =>
        val dot = (0 until dims).map { d =>
          element_at(vec, d + 1).cast("double") *
            lit(planeComponent(seed, j, d))
        }.reduce(_ + _)
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val bucketed = emb.select(col(idCol), col(vecCol),
      bucketCol(col(vecCol)).as("bucket"))
    val qRow = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol), col("bucket")).head()
    val qVec = qRow.getSeq[Float](0)
    val qBucket = qRow.getLong(1)
    val qArr = array(qVec.map(v => lit(v)): _*)
    bucketed
      .filter(col("bucket") === qBucket && col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol), qArr), 4).as("cos_r"))
      .orderBy(desc("cos_r"), col(idCol))
      .limit(k)
  }
}
