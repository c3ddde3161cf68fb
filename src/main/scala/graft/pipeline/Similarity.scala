package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore

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

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max(|x|)/127, q_i = floor(x_i/scale + 0.5) ∈ [−127, 127] —
    * the standard 4× memory cut that makes a 100 TB ANN corpus fit its
    * executors, with full-precision rescoring left to the final top-k.
    * Pure per-row arithmetic (floor/div/add are IEEE-identical across
    * engines, so the oracle matches bit-for-bit); zero vectors quantize
    * to zeros with scale 0. */
  def quantizeInt8(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding"),
      (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0)
        .as("scale"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("scale") + 0.5).cast("int")))
          .as("q"))

  /** Label-centroid margin filter (the CLIP-score-style consistency
    * gate, integer-exact): each embedding scores against its OWN
    * label's centroid and the best OTHER label's centroid; vectors
    * whose own-label mean-dot is beaten by another label's are flagged
    * misaligned — the standard cross-modal / weak-label cleaning cut
    * (keep pairs whose claimed label is also their nearest).
    *
    * Exactness across engines: vectors are first int8-quantized
    * ([[quantizeInt8]]'s formula), centroids are per-dim LONG SUMS of
    * the quantized values (no float accumulation anywhere), a vector×
    * centroid dot is a LONG, and the only float op is ONE IEEE division
    * dot/n per (vector, label) — identical operands → identical bits →
    * the 1e-6 micro rounding can never disagree.
    *
    * Shape at 100 TB: one posexplode + groupBy(label, dim) map-side-
    * combined aggregate; ONLY O(labels·dims) longs ever reach the
    * driver (corpus-size-independent, like the k-means means), and the
    * per-vector argmax is a codegen fold over L literal centroids — no
    * join, no second shuffle over the corpus.
    *
    * Output: (vec_id, label, own_micro, best_other_label,
    * best_other_micro, aligned). */
  def labelCentroidMargin(embs: DataFrame): DataFrame = {
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0
    val q = embs.select(col("vec_id"), col("label"), col("embedding"),
        scale.as("scale"))
      .withColumn("q",
        when(col("scale") === 0.0, transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("scale") + 0.5).cast("int"))))
      .select(col("vec_id"), col("label"), col("q"))
    val sums = q.select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("v").cast("long")).as("cs"), count(lit(1)).as("n"))
      .collect()
    require(sums.nonEmpty, "empty embedding corpus")
    val cents: Seq[(Int, Array[Long], Long)] = sums
      .groupBy(_.getInt(0)).toSeq
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray, rows.head.getLong(3))
      }.sortBy(_._1)
    val dims = cents.head._2.length
    // per-label mean dot: (Σ_d q[d]·cs_l[d]) / n_l — long dot, one division.
    // Means land in ONE array column first; everything downstream is an
    // attribute reference, so the argmax never duplicates the 64-term
    // dot subtrees (a naive when-chain fold is exponential in L).
    def meanDot(l: (Int, Array[Long], Long)): Column = {
      val dot = (0 until dims).map(d =>
        element_at(col("q"), d + 1).cast("long") * lit(l._2(d))).reduce(_ + _)
      dot.cast("double") / lit(l._3.toDouble)
    }
    val withMeans = q.withColumn("_means", array(cents.map(meanDot): _*))
    val own = cents.zipWithIndex.map { case (c, i) =>
        when(col("label") === c._1, element_at(col("_means"), i + 1)) }
      .reduceRight((a, b) => a.otherwise(b))
    // struct max orders by (m, -l): largest mean, then SMALLEST label
    val candidates = array(cents.zipWithIndex.map { case (c, i) =>
      struct(element_at(col("_means"), i + 1).as("m"), lit(-c._1).as("nl")) }: _*)
    withMeans
      .withColumn("_best",
        array_max(filter(candidates, x => x.getField("nl") =!= -col("label"))))
      .select(col("vec_id"), col("label"),
        round(own * 1e6, 0).cast("long").as("own_micro"),
        (-col("_best").getField("nl")).as("best_other_label"),
        round(col("_best").getField("m") * 1e6, 0).cast("long").as("best_other_micro"))
      .withColumn("aligned", col("own_micro") >= col("best_other_micro"))
  }

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
    rankTopK(scored, k)
  }

  /** Exact per-query top-k via the bounded partial aggregate
    * (graft.functions.TopKByScore): map-side buffers cap at k, so the
    * shuffle carries q × k × partitions heap entries rather than every
    * scored row — the window-rank form shuffled the full q×n score
    * matrix. Output and tie-breaks (cos desc, neighbor_id asc) are
    * identical to `row_number()` over that ordering. */
  private[pipeline] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopKByScore.column(col("cos"), col("neighbor_id"), k).as("nb"))
      .select(col("query_id"), posexplode(col("nb")).as(Seq("pos", "nbr")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("nbr.neighbor_id").as("neighbor_id"),
        round(col("nbr.cos"), 5).as("cos_sim"))

  /** Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    * each vector is hashed into `bands` independent sign-pattern buckets
    * (`planes` hyperplanes per band); candidate pairs share at least one
    * (band, bucket) cell and are then verified with the exact cosine.
    *
    * Scale shape: one explode (×bands) + ONE shuffle by (band, bucket) for
    * the self-join — each cell is a co-located hash-join bucket, the n²
    * pair space never materializes (no cartesian product anywhere in the
    * plan). Recall = 1−(1−p^planes)^bands where p = 1 − angle/π; more
    * bands → higher recall, more planes → smaller cells. Output ordered
    * (id_a < id_b), deduped across bands before the exact verify so each
    * candidate pair is scored once. */
  def cosineNearDupsLsh(corpus: DataFrame, threshold: Double,
      planes: Int = 4, bands: Int = 8): DataFrame = {
    val dims = 64
    val w = planeWeights(bands * planes, dims)
    // per band b: bucket = sign pattern of planes [b*planes, (b+1)*planes)
    val bandBuckets = array((0 until bands).map { b =>
      val bucket = (0 until planes).map { p =>
        val planeLit = array(w(b * planes + p).map(lit): _*)
        when(TextHash.dot(col("embedding"), planeLit) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }: _*)
    val tagged = corpus
      .select(col("vec_id"), explode(bandBuckets).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = tagged.select(col("vec_id").as("id_a"), col("band"), col("bucket"))
      .join(tagged.select(col("vec_id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ea = corpus.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val eb = corpus.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    cand.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos_sim"))
  }

  /** All-pairs exact form — O(n²), NEVER the production path; kept solely
    * as the recall oracle for `cosineNearDupsLsh` in tests. */
  private[graft] def cosineNearDupsBrute(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos_sim"))
  }

  /** Default coarse-quantizer size. FIXED, never corpus-proportional:
    * driver memory and per-row argmax cost are O(cells), so cells must
    * not grow with the data (a stride-style "every Nth vector" sample is
    * a driver OOM and an O(N²/stride) argmax bill at 100 TB). */
  val DefaultCells: Int = 64

  /** Coarse quantizer: (cid, centroid as double[], l2 norm) sorted by
    * cid — the `cells` corpus vectors with the SMALLEST md5-derived hash
    * of their vec_id (hash-ranked sample: deterministic, engine-portable,
    * uniformly spread over the id space, and CORPUS-SIZE-INDEPENDENT).
    *
    * Scale shape: the ranking runs as a distributed TakeOrdered — each
    * partition keeps its local `cells` smallest, only `cells` rows ever
    * reach the driver (~16 KB at 64×64 dims), regardless of corpus size.
    * The cid-sorted order is the tie-break: `cellOf` takes the FIRST
    * strictly-greater update, so equal-cos ties resolve to the smallest
    * cid, matching ORDER BY cos DESC, cid in the oracle. Norms use a
    * left-to-right sum, bit-identical to list_sum in the SQL oracle. */
  private[pipeline] def quantizer(corpus: DataFrame, cells: Int): Seq[(Long, Seq[Double], Double)] = {
    require(cells >= 1, s"cells must be >= 1: $cells")
    val cents = corpus
      .select(col("vec_id"), col("embedding"),
        TextHash.hex60(col("vec_id").cast("string")).as("_h"))
      .orderBy(col("_h"), col("vec_id"))
      .limit(cells)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val ce = r.getSeq[Float](1).map(_.toDouble)
        (r.getLong(0), ce, math.sqrt(ce.map(x => x * x).sum))
      }.sortBy(_._1).toSeq
    require(cents.nonEmpty, "no centroids: corpus is empty")
    cents
  }

  /** Nearest-centroid id of `emb` over the literal quantizer — one
    * codegen'd projection, zero shuffle, no (vector, centroid) rows. */
  private def cellOf(emb: Column, cents: Seq[(Long, Seq[Double], Double)]): Column = {
    val scored = transform(typedLit(cents), c =>
      struct((TextHash.dot(emb, c.getField("_2")) /
        (TextHash.l2norm(emb) * c.getField("_3"))).as("cos"),
        c.getField("_1").as("cid")))
    aggregate(scored,
      struct(lit(-2.0).as("cos"), lit(-1L).as("cid")),
      (acc, s) => when(s.getField("cos") > acc.getField("cos"), s).otherwise(acc))
      .getField("cid")
  }

  /** Above this centroid count, nearest-cell assignment switches from
    * the literal-array argmax (one codegen expression — unbeatable at
    * IVF-coarse sizes, but the generated code grows with K) to a
    * broadcast-join argmax (K-row broadcast + map-side partial max —
    * one n-row shuffle, no K-proportional codegen). Both paths compute
    * the identical IEEE double cosine with the identical smallest-cid
    * tie-break, so the switch is invisible in results. */
  val LiteralArgmaxMaxCells: Int = 1024

  /** Broadcast-join nearest-centroid: `df` + `outCol` = argmax-cosine
    * cid. max(struct(cos, -cid)) reproduces `cellOf`'s first-strictly-
    * greater rule (ties → smallest cid) bit-for-bit. */
  private[pipeline] def assignByJoin(df: DataFrame,
      cents: Seq[(Long, Seq[Double], Double)],
      idCol: String, embCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centsDf = cents.toDF("_cid", "_ce", "_cnorm")
    df.crossJoin(broadcast(centsDf))
      .select(col(idCol), col(embCol), col("_cid"),
        (TextHash.dot(col(embCol), col("_ce")) /
          (TextHash.l2norm(col(embCol)) * col("_cnorm"))).as("_cs"))
      .groupBy(col(idCol))
      .agg(first(col(embCol)).as(embCol),
        max(struct(col("_cs").as("cos"), (-col("_cid")).as("ncid"))).as("_m"))
      .select(col(idCol), col(embCol), (-col("_m.ncid")).as(outCol))
  }

  /** Nearest-cell assignment, path chosen by centroid count. */
  private[pipeline] def assignCells(df: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
      idCol: String, embCol: String, outCol: String): DataFrame =
    if (cents.size <= LiteralArgmaxMaxCells)
      df.select(col(idCol), col(embCol), cellOf(col(embCol), cents).as(outCol))
    else assignByJoin(df, cents, idCol, embCol, outCol)

  /** `df` plus its IVF `cell` column (assignment against `corpus`'s
    * hash-ranked fixed-size quantizer). */
  def ivfAssign(df: DataFrame, corpus: DataFrame, cells: Int = DefaultCells): DataFrame = {
    val cents = quantizer(corpus, cells)
    assignCells(df, cents, "vec_id", "embedding", "cell")
  }

  /** Top-`nprobe` nearest cells (map-side, zero shuffle): the scored
    * centroid array sorts by (cos desc, cid asc) and the first nprobe
    * cids come back — same tie-break as `cellOf`, so nprobe=1 reproduces
    * single-probe assignment exactly. */
  private[pipeline] def cellsOf(emb: Column, cents: Seq[(Long, Seq[Double], Double)],
      nprobe: Int): Column = {
    val scored = transform(typedLit(cents), c =>
      struct((TextHash.dot(emb, c.getField("_2")) /
        (TextHash.l2norm(emb) * c.getField("_3"))).as("cos"),
        c.getField("_1").as("cid")))
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .otherwise(when(l.getField("cid") < r.getField("cid"), -1)
          .when(l.getField("cid") > r.getField("cid"), 1).otherwise(0)))
    transform(slice(sorted, 1, nprobe), s => s.getField("cid"))
  }

  /** Large-K top-`nprobe` cells: broadcast centroid join + bounded
    * TopKByScore partial aggregate (same (cos desc, cid asc) order as
    * `cellsOf`'s sort, so the probe SET is identical) — the multi-probe
    * analogue of [[assignByJoin]] for quantizers past the literal-
    * codegen limit. Output: one (query_id, qe, cell) row per probe. */
  private[pipeline] def probeByJoin(q: DataFrame,
      cents: Seq[(Long, Seq[Double], Double)], nprobe: Int): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val centsDf = cents.toDF("_cid", "_ce", "_cnorm")
    q.crossJoin(broadcast(centsDf))
      .select(col("query_id"), col("qe"), col("_cid"),
        (TextHash.dot(col("qe"), col("_ce")) /
          (TextHash.l2norm(col("qe")) * col("_cnorm"))).as("_cs"))
      .groupBy(col("query_id"))
      .agg(first(col("qe")).as("qe"),
        TopKByScore.column(col("_cs"), col("_cid"), nprobe).as("_nb"))
      .select(col("query_id"), col("qe"),
        explode(expr("transform(_nb, x -> x.neighbor_id)")).as("cell"))
  }

  /** IVF ANN; `nprobe > 1` searches the query's nprobe nearest cells
    * (recall knob — corpus still shuffles once by cell, queries just
    * explode ×nprobe before the broadcast join; nprobe = cell count
    * degenerates to exact kNN). */
  def annIvf(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = DefaultCells, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val cents = quantizer(corpus, cells)
    val assigned = assignCells(corpus, cents, "vec_id", "embedding", "cell")
    val q =
      if (nprobe == 1)
        assignCells(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qe")), cents, "query_id", "qe", "cell")
      else if (cents.size <= LiteralArgmaxMaxCells)
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          explode(cellsOf(col("embedding"), cents, nprobe)).as("cell"))
      else
        probeByJoin(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qe")), cents, nprobe)
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    rankTopK(scored, k)
  }

  /** SemDeDup-style semantic deduplication: embeddings are clustered by
    * the IVF coarse quantizer (nearest hash-ranked-sample centroid), and
    * within each cluster any vector whose cosine to a LOWER-id cluster
    * member reaches `threshold` is dropped — the lower id survives as the
    * representative. Output: surviving (vec_id, cell) rows.
    *
    * Scale shape (the reason SemDeDup clusters before comparing): the
    * pairwise cosine is confined to each cell, so candidate generation is
    * ONE shuffle by cell and O(Σ cell²) work with ~corpus/cells vectors
    * per cell — the n² pair space never materializes and no
    * cartesian product appears in the plan. A pathological mega-cell
    * (degenerate centroid attracting everything) is census-capped exactly
    * like the LSH band buckets: its members skip candidate generation and
    * are all KEPT — a recall bound, never a wrong drop. The domination
    * rule is "any earlier same-cell member ≥ threshold" (not a chain
    * through kept docs), so keep/drop decisions are per-pair parallel
    * with no sequential scan order. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      cells: Int = DefaultCells, maxCell: Int = Dedup.MaxBucket): DataFrame = {
    val assigned = ivfAssign(corpus, corpus, cells)
    val census = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    val bounded = assigned
      .withColumn("_cn", count(lit(1)).over(census))
      .filter(col("_cn") <= maxCell)
      .drop("_cn")
    val dominated = bounded
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("cell"))
      .join(bounded.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
        col("cell")), Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        cosine(col("ea"), col("eb")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(dominated, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Hard-negative mining for contrastive training: each anchor's
    * highest-cosine OTHER-label vector within its IVF cell — the
    * in-batch-negatives upgrade every embedding-model pipeline runs
    * (cell confinement keeps it O(cell²), never corpus²; the census cap
    * bounds pathological cells exactly like semantic dedup).
    *
    * Output: (vec_id, label, neg_id, neg_label, cos_sim 5 dp); anchors
    * whose cell holds no other-label vector are absent (inner
    * semantics). Ties break toward the smaller neg_id. */
  def hardNegatives(corpus: DataFrame, cells: Int = DefaultCells,
      maxCell: Int = Dedup.MaxBucket): DataFrame = {
    val assigned = ivfAssign(corpus, corpus, cells)
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
    val census = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    val bounded = assigned
      .withColumn("_cn", count(lit(1)).over(census))
      .filter(col("_cn") <= maxCell)
      .drop("_cn")
    val scored = bounded
      .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
        col("label").as("la"), col("cell"))
      .join(bounded.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("eb"), col("label").as("lb"), col("cell")),
        Seq("cell"))
      .filter(col("la") =!= col("lb"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("ea"), col("eb")).as("cos"))
    rankTopK(scored, 1)
      .select(col("query_id").as("vec_id"), col("neighbor_id").as("neg_id"),
        col("cos_sim"))
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .join(corpus.select(col("vec_id").as("neg_id"),
        col("label").as("neg_label")), Seq("neg_id"))
      .select(col("vec_id"), col("label"), col("neg_id"), col("neg_label"),
        col("cos_sim"))
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
    rankTopK(scored, k)
  }

  /** Deterministic distributed k-means (Lloyd's, cosine assignment) —
    * the clustering primitive behind cluster-balanced sampling and
    * SemDeDup-style curation, here as a standalone driver-checked
    * operator. Initial centroids are the hash-ranked fixed-size sample
    * (cluster id = seed vec_id, stable across iterations); each
    * iteration assigns map-side against broadcast centroid literals
    * (same codegen argmax as IVF, no shuffle, no (vector, centroid)
    * rows), then recomputes centroids with ONE map-side-combined
    * (cluster, dim) average shuffle of n×dims skinny rows. Only
    * cells×dims rounded means ever reach the driver — O(cells), never
    * O(corpus).
    *
    * Cross-engine determinism: per-dim means are rounded to 6 decimals
    * before re-use, collapsing summation-order ulps, so Spark and the
    * DuckDB oracle see bit-identical centroids; dot products and norms
    * are left-to-right double folds on both sides. Ties in assignment
    * break to the smallest cluster id. */
  def kmeans(corpus: DataFrame, cells: Int = DefaultCells, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    var cents = quantizer(corpus, cells)
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      assigned = assignCells(corpus, cents, "vec_id", "embedding", "cluster")
      if (it < iters) {
        val dm = assigned
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("d", "v")))
          .groupBy(col("cluster"), col("d"))
          .agg(round(avg(col("v").cast("double")), 6).as("m"))
          .collect()
        cents = dm.groupBy(_.getLong(0)).toSeq.map { case (cid, rows) =>
          val ce = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          (cid, ce, math.sqrt(ce.map(x => x * x).sum))
        }.sortBy(_._1)
      }
    }
    if (cents.size <= LiteralArgmaxMaxCells)
      assigned.select(col("vec_id"), col("cluster"),
        round(cosineToLit(col("embedding"), cents), 5).as("cos_sim"))
    else {
      // large K: cosine to the ASSIGNED centroid via broadcast join —
      // equal to the max-cosine by construction, same IEEE formula
      val spark = corpus.sparkSession
      import spark.implicits._
      val centsDf = cents.toDF("_cid", "_ce", "_cnorm")
      assigned.join(broadcast(centsDf), col("cluster") === col("_cid"))
        .select(col("vec_id"), col("cluster"),
          round(TextHash.dot(col("embedding"), col("_ce")) /
            (TextHash.l2norm(col("embedding")) * col("_cnorm")), 5).as("cos_sim"))
    }
  }

  /** Cosine of `emb` against its assigned centroid from the literal
    * table — a second map-side pass so the output carries the final
    * similarity without a join. */
  private def cosineToLit(emb: Column,
      cents: Seq[(Long, Seq[Double], Double)]): Column = {
    val scored = transform(typedLit(cents), c =>
      struct((TextHash.dot(emb, c.getField("_2")) /
        (TextHash.l2norm(emb) * c.getField("_3"))).as("cos"),
        c.getField("_1").as("cid")))
    aggregate(scored,
      struct(lit(-2.0).as("cos"), lit(-1L).as("cid")),
      (acc, s) => when(s.getField("cos") > acc.getField("cos"), s).otherwise(acc))
      .getField("cos")
  }

  /** ANN recall audit: recall@k of the IVF path against the exact
    * brute-force kNN on the SAME query set — the embedding-pillar twin
    * of [[Dedup.lshRecallAudit]]. Per query: how many of the true top-k
    * neighbors the cell-confined search returned.
    *
    * Shape: the exact side is the declared brute-force control (query
    * side broadcast); the IVF side is the production path; the audit is
    * one (query_id, neighbor_id) equi-join + per-query aggregate. Run
    * over a query SAMPLE at scale — cost is sample × corpus, never
    * corpus². */
  def annRecallAudit(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = DefaultCells, nprobe: Int = 1): DataFrame = {
    val exact = knnBruteForce(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = annIvf(queries, corpus, k, cells, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        expr("n_hit * 1000 DIV n_exact").as("recall_permille"))
  }

  /** PQ codebook: the `codes` hash-ranked seed vectors (same
    * deterministic corpus-size-independent rule as [[quantizer]]),
    * micro-quantized, re-indexed 0..codes−1 in vec_id order. Driver
    * state O(codes·dims) at any corpus size. */
  private[pipeline] def pqCodebook(corpus: DataFrame, codes: Int): Seq[(Int, Seq[Long])] = {
    val seeds = corpus
      .select(col("vec_id"), col("embedding"),
        TextHash.hex60(col("vec_id").cast("string")).as("_h"))
      .orderBy(col("_h"), col("vec_id")).limit(codes)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq))
      .sortBy(_._1).toSeq
    require(seeds.size == codes, s"corpus smaller than $codes codebook seeds")
    seeds.zipWithIndex.map { case ((_, q), i) => (i, q) }
  }

  private[pipeline] def microQ(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Per-subspace argmin over the literal codebook: struct(dist, k) with
    * strict-< keeping the smallest k on ties — ORDER BY d, k in SQL. */
  private[pipeline] def pqBest(cb: Seq[(Int, Seq[Long])], j: Int, dsub: Int): Column = {
    val cents = typedLit(cb.map { case (k, full) =>
      (k, full.slice(j * dsub, (j + 1) * dsub)) })
    val sub = slice(col("_q"), j * dsub + 1, dsub)
    val scored = transform(cents, c => struct(
      aggregate(zip_with(sub, c.getField("_2"), (a, b) => (a - b) * (a - b)),
        lit(0L), _ + _).as("dist"),
      c.getField("_1").as("k")))
    aggregate(scored, struct(lit(Long.MaxValue).as("dist"), lit(-1).as("k")),
      (acc, s) => when(s.getField("dist") < acc.getField("dist"), s)
        .otherwise(acc))
  }

  /** Product quantization ENCODE (Jégou et al.): split each vector into
    * `m` subspaces, snap each subvector to its nearest codebook centroid
    * — a vector becomes `m` small codes (here 8×4 bits ≈ 64× smaller
    * than float32), THE memory trick that fits a 100 TB ANN corpus in
    * executor RAM. Codebook = hash-ranked seeds (corpus-size-independent
    * driver state); distances are INTEGER sums over micro-quantized
    * values, so the argmin — and the oracle — are exact.
    *
    * Output (vec_id, subspace, code, sq_err): pure map work, the
    * codebook rides the codegen'd projection as literals. */
  def pqEncode(embs: DataFrame, m: Int = 8, codes: Int = 16): DataFrame = {
    val cb = pqCodebook(embs, codes)
    val dsub = cb.head._2.size / m
    embs.select(col("vec_id"), microQ(col("embedding")).as("_q"))
      .select(col("vec_id"), posexplode(array(
        (0 until m).map(j => pqBest(cb, j, dsub)): _*)).as(Seq("subspace", "b")))
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        col("b.k").cast("long").as("code"), col("b.dist").as("sq_err"))
  }

  /** Codebook reconstruction of the `_codes` array: concat of the
    * chosen centroid subvectors (literal lookup, codegen'd). */
  private[pipeline] def pqReconstruct(cbLit: Column, m: Int, dsub: Int): Column =
    flatten(transform(sequence(lit(0), lit(m - 1)),
      j => slice(element_at(cbLit, element_at(col("_codes"), j + 1) + 1),
        j * dsub + 1, lit(dsub))))

  /** PQ asymmetric-distance search (ADC): corpus vectors live ONLY as
    * codes; each query scans their codebook reconstructions — the exact
    * inner loop of IVFADC serving (production confines the scan to IVF
    * cells; the linear form here is the declared control, query side
    * broadcast). Distances are integer micro² sums → bit-exact ranking;
    * per-query top-k via the bounded native aggregate (score = −dist
    * rides a double: exact below 2⁵³). */
  def pqAdcSearch(queries: DataFrame, corpus: DataFrame, topK: Int = 10,
      m: Int = 8, codes: Int = 16): DataFrame = {
    val cb = pqCodebook(corpus, codes)
    val dsub = cb.head._2.size / m
    val cbLit = typedLit(cb.map(_._2)) // index k+1 → full micro centroid
    val coded = corpus
      .select(col("vec_id"), microQ(col("embedding")).as("_q"))
      .select(col("vec_id"), array(
        (0 until m).map(j => pqBest(cb, j, dsub).getField("k")): _*).as("_codes"))
      .select(col("vec_id"), pqReconstruct(cbLit, m, dsub).as("_rq"))
    val q = queries
      .select(col("vec_id").as("query_id"), microQ(col("embedding")).as("_qm"))
    val dist = aggregate(
      zip_with(col("_qm"), col("_rq"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    coded.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), dist.as("_d"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.column(
        negate(col("_d").cast("double")), col("vec_id"), topK).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).cast("long").as("rank"),
        col("_t.neighbor_id").as("neighbor_id"),
        negate(col("_t.cos")).cast("long").as("adc_dist"))
  }

  /** IVFADC: the full production ANN serving shape — the coarse IVF
    * quantizer confines each query to ONE cell, and within the cell the
    * ranking runs over PQ codebook reconstructions (ADC). Unlike the
    * linear [[pqAdcSearch]] control, the candidate join is a plain
    * EQUI-join on the cell key: at 100 TB the codes table is ~64×
    * smaller than the floats AND each query touches corpus/cells of it.
    * Both stages reuse the audited parts bit-for-bit: cell assignment =
    * [[ivfAssign]] (p12's oracle), distances = the integer micro² ADC
    * (p78's oracle). */
  def ivfAdcSearch(queries: DataFrame, corpus: DataFrame, topK: Int = 10,
      cells: Int = DefaultCells, m: Int = 8, codes: Int = 16): DataFrame = {
    val cb = pqCodebook(corpus, codes)
    val dsub = cb.head._2.size / m
    val cbLit = typedLit(cb.map(_._2))
    val coded = ivfAssign(corpus, corpus, cells)
      .select(col("vec_id"), col("cell"), microQ(col("embedding")).as("_q"))
      .select(col("vec_id"), col("cell"), array(
        (0 until m).map(j => pqBest(cb, j, dsub).getField("k")): _*).as("_codes"))
      .select(col("vec_id"), col("cell"), pqReconstruct(cbLit, m, dsub).as("_rq"))
    val q = ivfAssign(queries, corpus, cells)
      .select(col("vec_id").as("query_id"), col("cell"),
        microQ(col("embedding")).as("_qm"))
    val dist = aggregate(
      zip_with(col("_qm"), col("_rq"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    coded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), dist.as("_d"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.column(
        negate(col("_d").cast("double")), col("vec_id"), topK).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).cast("long").as("rank"),
        col("_t.neighbor_id").as("neighbor_id"),
        negate(col("_t.cos")).cast("long").as("adc_dist"))
  }

  /** Deterministic ±1 sign for JL cell (i, j): low bit of the first
    * md5 byte of "i:j" — reproducible from the indices alone, so the
    * "matrix" never ships anywhere. */
  private[pipeline] def jlSign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1 else -1
  }

  /** Johnson–Lindenstrauss random-sign projection: `outDims` output
    * coordinates, each Σᵢ xᵢ·s(i,j) with a fixed ±1 hash-sign matrix —
    * the Achlioptas database-friendly JL variant (no Gaussians, no
    * stored matrix). Distances are preserved in expectation
    * (E[‖Px‖²] = ‖x‖²·d/k); pipelines use it to shrink embeddings
    * before LSH banding or transport.
    *
    * Determinism: inputs quantize to micro-int units FIRST
    * (float→double is exact; round on identical doubles), so each
    * output is an INTEGER dot product — summation-order-free, exact in
    * both engines. Pure map work: zero shuffles at any scale; the sign
    * matrix is inlined into the codegen'd projection as literals. */
  def jlProject(embs: DataFrame, inDims: Int = 64, outDims: Int = 16): DataFrame = {
    val q = transform(col("embedding"),
      x => round(x.cast("double") * 1e6, 0).cast("long"))
    val projCols = (0 until outDims).map { j =>
      val signs = array((0 until inDims).map(i => lit(jlSign(i, j).toLong)): _*)
      aggregate(zip_with(q, signs, (a, s) => a * s), lit(0L), _ + _)
        .as(s"p$j")
    }
    embs.select(col("vec_id") +: projCols: _*)
      .select(col("vec_id"), posexplode(array(
        (0 until outDims).map(j => col(s"p$j")): _*)).as(Seq("dim", "proj_micro")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("proj_micro"))
  }
}
