package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring what a 100 TB training-data pipeline needs:
  *   - `knnBruteForce`: exact cosine top-k — the correctness baseline.
  *     The query side is small (broadcast); the corpus streams through
  *     one codegen'd projection, so the cost is one full corpus pass per
  *     query batch with NO shuffle of the corpus itself (the only shuffle
  *     is the per-query top-k, k rows per query after partial top-k).
  *   - `annLsh`: random-hyperplane LSH. Vectors are bucketed by the sign
  *     pattern of `planes` deterministic hyperplane projections; the
  *     candidate join is per-bucket (corpus shuffled once by bucket id —
  *     at 1000 executors each bucket is a co-located hash-join cell,
  *     never an all-pairs cross join). Recall is tuned by `planes` (fewer
  *     planes → bigger buckets → higher recall) and multi-probe can be
  *     added by exploding each query to adjacent buckets.
  *
  * Hyperplane weights are md5-derived integers (TextHash.hex60), so the
  * whole ANN pipeline is deterministic and bit-reproducible in the
  * driver's DuckDB oracle: weight(plane i, dim j) = hex60("i_j") % 2001
  * − 1000 ∈ [−1000, 1000]. Integer × float products are exact in double,
  * so bucket assignment never flips across engines.
  */
object Similarity {

  /** cos(a,b) with left-to-right double math (bit-identical to the SQL
    * oracle; see TextHash.dot). */
  def cosine(a: Column, b: Column): Column =
    TextHash.dot(a, b) / (TextHash.l2norm(a) * TextHash.l2norm(b))

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (query_id, rank, neighbor_id, cos_sim rounded to 5 dp).
    * Ties broken by neighbor id (ascending) for determinism. */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cos"), 5).as("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b) with cos ≥
    * threshold. This brute-force form is the correctness baseline; the
    * 100 TB path replaces the cross join with `annLsh`-style bucketing
    * (candidates share a hyperplane-sign bucket) so the pair space never
    * materializes. Output ordered (id_a < id_b). */
  def cosineNearDups(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos_sim"))
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest coarse centroid (deterministic sample: every `stride`-th
    * vector), queries search only their own cell. One broadcast of the
    * centroid table + one shuffle by cell id — at 100 TB the cell
    * assignment is a map stage and each cell is a co-located join bucket;
    * recall is tuned by probing adjacent cells (nprobe, not implemented —
    * single-probe keeps the driver-checked output deterministic). */
  def annIvf(queries: DataFrame, corpus: DataFrame, k: Int,
      stride: Int = 31): DataFrame = {
    val cents = corpus.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("ce")).as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
    val q = assigned.join(queries.select("vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cell"))
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 5).as("cos_sim"))
  }

  /** Deterministic hyperplane weights for `planes`×`dims`. */
  def planeWeights(planes: Int, dims: Int): Array[Array[Long]] =
    Array.tabulate(planes, dims)((i, j) => TextHash.hex60(s"${i}_${j}") % 2001L - 1000L)

  /** Sign-pattern LSH bucket id of an embedding column. */
  def lshBucket(emb: Column, weights: Array[Array[Long]]): Column =
    weights.zipWithIndex.map { case (w, i) =>
      val planeLit = array(w.map(lit): _*)
      when(TextHash.dot(emb, planeLit) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Output: (query_id, rank, neighbor_id, cos_sim). */
  def annLsh(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 4): DataFrame = {
    val dims = 64
    val w = planeWeights(planes, dims)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      lshBucket(col("embedding"), w).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      lshBucket(col("embedding"), w).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cos"), 5).as("cos_sim"))
  }
}
