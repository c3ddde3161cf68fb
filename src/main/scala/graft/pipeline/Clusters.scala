package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster construction: connected components over near-dup
  * candidate pairs, turning pairwise similarity edges into dedup groups
  * with one canonical (minimum-id) representative each — the step that
  * converts a near-dup JOIN's output into an actual "keep one copy"
  * decision at corpus scale.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SOCC'14) — each round
  * is two bounded shuffles (a per-node min aggregate + a join back to the
  * edge list), and the edge set contracts toward star graphs rooted at
  * each component's minimum id in O(log n) rounds even for adversarial
  * path-shaped graphs (plain label propagation needs O(diameter)).
  *
  * 100 TB design notes:
  *   - the driver holds NO graph state — only the per-round boolean of
  *     the structural convergence test;
  *   - `localCheckpoint` truncates lineage each round so the plan does
  *     not grow with iterations (a growing plan re-executes every prior
  *     round's shuffles on each action);
  *   - duplicate clusters from LSH near-dup edges are near-cliques, so
  *     typical convergence is 2–3 rounds; the log-n bound only matters
  *     for pathological chain-of-near-dups graphs, which this handles
  *     without assuming them away.
  */
object Clusters {

  /** Distinct-edge count at or below which components are solved with a
    * DRIVER-side union-find instead of the iterative star contraction.
    * BOUNDED collect, same class as the K-centroid seeds: below it, one
    * collect + O(n α(n)) beats ~5 shuffle stages × O(log n) rounds on
    * ANY cluster — near-dup edge sets are usually pair-sparse even when
    * the corpus is 100 TB. Honest driver-heap budget at the default:
    * 200k Tuple2[Long, Long] rows (~10 MB) plus a boxed parent map of
    * ≤400k entries (~30 MB) — transient tens of MB, safe on any real
    * driver. Above it, the distributed loop runs unchanged. */
  val LocalSolveEdges: Long = 200000L

  /** Connected components over an undirected edge list.
    *
    * @param edges two long columns (`src`, `dst`), one row per edge;
    *              self-loops and duplicates are tolerated.
    * @return (`id`, `component`) for every node that appears in `edges`,
    *         where `component` is the minimum node id in its component.
    */
  def connectedComponents(edges: DataFrame, src: String = "id_a",
      dst: String = "id_b", maxRounds: Int = 50,
      localSolveEdges: Long = LocalSolveEdges): DataFrame = {
    val spark = edges.sparkSession
    var e = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)

    // the count materializes the checkpoint the first round would pay
    // for anyway; a small edge set short-circuits the whole loop
    if (e.count() <= localSolveEdges) return localSolve(spark, e)

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      // single exact exit: the alternation's fixpoints are precisely the
      // star forests under the (greater, lesser) orientation, so the
      // structural test (one node-bounded aggregate over the cached
      // round output) IS the convergence test — the old fingerprint
      // fixpoint pass was a second action per round proving a weaker
      // condition (set equality implies star forest, not vice versa);
      // LSH near-dup graphs are near-cliques that collapse in one round,
      // so the structural exit also saves the full confirming round a
      // fixpoint comparison needs.
      converged = isStarForest(next)
      e.unpersist()
      e = next
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")

    // e is now a star forest oriented child(u) → root(v); roots map to themselves
    val members = e.select(col("u").as("id"), col("v").as("component"))
    val roots = e.select(col("v").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    // materialize the (small: one row per clustered node) result and drop
    // the last round's cached edges — without this, every CC invocation
    // leaked one checkpointed edge RDD into the session for its lifetime,
    // which in a long-lived session (or a bench loop) accretes into
    // storage-memory pressure that taxes every later query
    val result = members.union(roots).localCheckpoint(true)
    e.unpersist()
    result
  }

  /** Driver union-find for edge sets under [[LocalSolveEdges]]: path
    * compression + union-by-min, result re-parallelized at session
    * parallelism so downstream joins distribute normally. */
  private def localSolve(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // typed collect: Tuple2 of longs, not GenericRow (≈10× less heap)
    e.as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      else parent.getOrElseUpdate(ra, ra)
      // ensure both endpoints exist as keys so the final sweep sees them
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    // materialize the key set BEFORE the final sweep: find() compresses
    // paths (mutates the map), and iterating a mutable HashMap while
    // writing it silently skips entries
    val rows = parent.keys.toArray.map(n => (n, find(n))).toSeq
    e.unpersist()
    spark.sparkContext
      .parallelize(rows, spark.sessionState.conf.numShufflePartitions)
      .toDF("id", "component")
  }

  /** Large-star: every node links its strictly-LARGER neighbors to the
    * minimum of its neighborhood (incl. itself). Keeps edge count bounded
    * (never emits more edges than it consumes, SOCC'14 Lemma 1). */
  private[pipeline] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(greatest(col("v"), col("m")).as("u"), least(col("v"), col("m")).as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: every node links its smaller-or-equal neighbors (and
    * itself) to the minimum of its smaller neighborhood. */
  private[pipeline] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    val linked = dir.join(mins, "u")
      .select(col("v").as("n"), col("m"))
    val self = mins.select(col("u").as("n"), col("m"))
    linked.union(self)
      .filter(col("n") =!= col("m"))
      .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
      .distinct()
  }

  /** Structural convergence test: with edges oriented (u, v) = (greater,
    * lesser), the set is a star forest — a fixpoint of the large-star/
    * small-star alternation — iff (a) no node appears both as a child (u)
    * and as a parent (v), AND (b) every child appears exactly once.
    * Disjointness alone is NOT sufficient: edges (10,3),(10,1) have
    * disjoint sides but node 10 has two parents, so reading the set as a
    * forest would put 10 in two components. One node-bounded aggregate
    * over the checkpointed round output; no driver materialization.
    * Since each round preserves connectivity, a star-forest fixpoint's
    * stars are exactly the original components, rooted at their minima
    * (parent < child under this orientation). */
  private def isStarForest(e: DataFrame): Boolean =
    e.select(col("u").as("n"), lit(1L).as("c"), lit(0L).as("p"))
      .unionAll(e.select(col("v").as("n"), lit(0L).as("c"), lit(1L).as("p")))
      .groupBy(col("n"))
      .agg(sum(col("c")).as("c"), sum(col("p")).as("p"))
      .filter(col("c") > 1 || (col("c") > 0 && col("p") > 0))
      .isEmpty

  /** End-to-end duplicate clustering: MinHash-LSH near-dup edges (bucket-
    * bounded candidates, exact-Jaccard verified — the join that runs at
    * 100 TB; see Dedup.minhashNearDups) → connected components →
    * (doc_id, cluster_id) with cluster_id = min doc_id. Docs with no
    * near-duplicate are omitted (singleton clusters are the overwhelming
    * majority of a real corpus and carry no decision). */
  def duplicateClusters(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, threshold)
    connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Cross-source duplication matrix: for each unordered source pair,
    * how many near-dup doc pairs span them — the provenance report that
    * surfaces which domains mirror each other's content (within-source
    * pairs land on the diagonal). Two doc_id-keyed joins onto the
    * (already tiny) verified-pair set; the corpus itself never
    * re-shuffles. */
  def crossSourceDupMatrix(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.minhashNearDups(docs, threshold)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), Seq("id_b"))
      .select(least(col("_sa"), col("_sb")).as("source_a"),
        greatest(col("_sa"), col("_sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-source near-dup rate: how much of each source's volume sits in
    * a near-dup pair — the one-row-per-source health metric dedup
    * dashboards track (a source whose rate jumps is mirroring or being
    * scraped twice). Zero-dup sources report 0, not absence.
    *
    * Shape: the member set is pair-set-sized; both joins hang off it,
    * the corpus contributes one map-side-combined per-source count. */
  def dupRateBySource(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, threshold)
    val members = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val dupBySource = members
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup"))
    perSource.join(dupBySource, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_members"),
        expr("coalesce(n_dup, 0L) * 1000 DIV n_docs").as("dup_permille"))
  }

  /** Quality-aware canonical selection: within each duplicate cluster,
    * the highest-quality member (distinct-word ratio, micro-quantized →
    * integer-deterministic argmax, doc_id tie-break) is marked
    * canonical — production dedup keeps the BEST copy, not the first
    * one seen. One rank window over the cluster frame (cluster-sized,
    * not corpus-sized). */
  def canonicalByQuality(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val w = graft.pipeline.TextHash.words(col("text"))
    val scored = docs.select(col("doc_id"),
      round(size(array_distinct(w)) * lit(1e6) / size(w), 0).cast("long")
        .as("score_micro"))
    val rankWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    duplicateClusters(docs, threshold)
      .join(scored, Seq("doc_id"))
      .withColumn("rank", row_number().over(rankWin).cast("long"))
      .select(col("doc_id"), col("cluster_id"), col("score_micro"),
        (col("rank") === 1).as("canonical"))
  }
}
