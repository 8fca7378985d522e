package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim

/** Approximate-nearest-neighbor search over an embedding column (SURVEY §2.6
  * north-star). Two paths:
  *
  *   - [[bruteForceTopK]]: exact scan — the single-query baseline. The query
  *     vector is broadcast (one row), so the scan is embarrassingly parallel
  *     and the only global step is the top-k (Spark's TakeOrderedAndProject,
  *     per-partition heaps + driver merge of k rows, no full sort shuffle).
  *   - [[lshTopK]]: random-hyperplane LSH — each vector gets a small integer
  *     bucket from the sign pattern of `nPlanes` fixed hyperplanes; search
  *     touches only the query's bucket. At 100 TB the bucket column becomes
  *     the table's partition key so a query prunes to one partition.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (fixed LCG, values in [-1,1]). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 11L): Array[Array[Double]] =
    graft.functions.HashFamilies.hyperplanes(nPlanes, dim, seed)

  /** Sign-pattern LSH bucket id for an embedding column. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(cosine_sim(emb, lit(p)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact cosine top-k neighbors of the vector with id `queryId`. */
  def bruteForceTopK(embs: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = embs.where(col(idCol) === queryId).select(col(embCol).as("qv"))
    embs.join(broadcast(q))
      .where(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine_sim(col(embCol), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding width, inferred from the data when the caller doesn't know
    * it statically (one-row lookup; cheap next to any similarity join).
    */
  def inferDim(embs: DataFrame, embCol: String): Int =
    embs.select(size(col(embCol)).as("d")).head().getInt(0)

  /** LSH-bucketed ANN top-k with OR-amplification: `nTables` independent
    * hash tables of `nPlanes` hyperplanes each; a vector is a candidate when
    * it shares the query's bucket in ANY table (union of buckets), which is
    * the standard recall lever for sign-LSH — one table alone recalls poorly
    * because a near neighbor straddling a single hyperplane is lost.
    *
    * `dim <= 0` (default) infers the embedding width from the data —
    * hyperplanes MUST match it exactly or `cosine_sim` throws (it refuses
    * to silently bucket on a prefix of the vector).
    *
    * Scale shape: candidates are found by an equi-join on (table, bucket) —
    * expected candidate fraction ≈ nTables / 2^nPlanes, tunable per corpus.
    * At 100 TB the (table, bucket) pair becomes the partition key of a
    * pre-bucketed index table so a query prunes to `nTables` partitions.
    */
  def lshTopK(embs: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int, nPlanes: Int = 4, nTables: Int = 12,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else inferDim(embs, embCol)
    // all tables' buckets in ONE pass over the vector (HyperplaneBuckets):
    // sign-LSH needs only dot-product signs, so per-plane cosine_sim calls
    // would re-read the embedding and compute norms 4*nTables times over
    val buckets = graft.functions.GraftFunctions
      .hyperplane_buckets(col(embCol), nTables, nPlanes, d)
    // (id, emb, table, bucket) posting rows — nTables rows per vector
    val posted = embs
      .select(col(idCol), col(embCol), posexplode(buckets).as(Seq("table", "bucket")))
    val q = posted.where(col(idCol) === queryId)
      .select(col(embCol).as("qv"), col("table").as("qt"), col("bucket").as("qb"))
    posted.join(broadcast(q),
        col("table") === col("qt") && col("bucket") === col("qb"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine_sim(col(embCol), col("qv")), 4).as("sim"))
      // a candidate can match in several tables; its sim is identical in
      // each, so max() dedups via a HashAggregate — dropDuplicates on the
      // (id, embedding) row would force a SortAggregate carrying the whole
      // vector through first()
      .groupBy(col(idCol)).agg(max(col("sim")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
