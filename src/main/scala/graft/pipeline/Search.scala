package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the documents table: BM25 (Robertson/Sparck
  * Jones probabilistic ranking, the standard inverted-index scoring
  * function) — the lexical complement of the embedding ANN operators
  * (Similarity): hybrid search pipelines run both and merge.
  *
  * Scale shape (no inverted index needed on Spark): ONE tokenizing pass
  * computes per-doc term frequencies for the (few) query terms; corpus
  * statistics (N, total length, per-term document frequencies) reduce to
  * a single driver row whose values become literals — the corpus is
  * never shuffled and never joined, the scoring stage is a pure codegen
  * map, and the top-k runs as TakeOrdered (per-partition heaps). At
  * 100 TB: two columnar scans of one string column, zero exchanges.
  *
  * Determinism (cross-engine oracle): per-term idf is rounded to 6
  * decimals BEFORE use, the per-doc score sums terms in FIXED query
  * order (ln is the only non-IEEE-exact op, and it only reaches the
  * output through the rounded idf), avgdl is an exact integer ratio
  * (sum/count, not an incremental mean), and the final score rounds to
  * 4 decimals with doc_id as the total-order tiebreak.
  */
object Search {

  /** Top-`k` docs for `terms` under BM25(k1, b). Output:
    * (doc_id, score, matched) ordered by score desc, doc_id. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "1..8 query terms")
    val w = TextHash.words(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(w, x => x === lit(t))).cast("long").as(s"_tf$i")
    }
    val tf = docs.select(col("doc_id") +: (w.as("_w") +: tfCols): _*)
      .withColumn("_dl", size(col("_w")).cast("long")).drop("_w")

    // corpus statistics: one aggregate → one driver row → literals
    val statCols = Seq(count(lit(1)).as("n"), sum(col("_dl")).as("sumdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stat = tf.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = stat.getLong(0)
    val avgdl = stat.getLong(1).toDouble / n // exact integer ratio
    val idf = terms.indices.map { i =>
      val df = stat.getLong(2 + i).toDouble
      BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    def tfPart(tfc: Column): Column =
      tfc.cast("double") * (k1 + 1.0) /
        (tfc.cast("double") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("_dl").cast("double") / lit(avgdl)))
    val score = terms.indices
      .map(i => lit(idf(i)) * tfPart(col(s"_tf$i")))
      .reduce(_ + _) // fixed query-term order: deterministic double sum
    val matched = terms.indices
      .map(i => when(col(s"_tf$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)

    tf.filter(terms.indices.map(i => col(s"_tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), round(score, 4).as("score"),
        matched.as("matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Inverted-index BUILD: term → (document frequency, total term
    * frequency, capped posting list). The materialized artifact behind
    * interactive retrieval — [[bm25]] scores ad-hoc without one, but a
    * serving stack persists this table (partitioned by term) and joins
    * queries against it.
    *
    * Postings are the first `cap` doc_ids in ascending order (CSV string
    * for cross-engine hash stability) with the TRUE df/tf kept alongside,
    * so truncation loses ranking signal for no term.
    *
    * Scale shape: one token explode and ONE exchange on the term key;
    * within-doc duplicates collapse map-side via the (term, doc_id)
    * pre-aggregate, so the shuffle carries distinct (term, doc) cells,
    * not raw tokens. Postings use the bounded native top-k aggregate
    * (score = −doc_id ⇒ smallest ids win), so a stop-word term holds
    * `cap` ids of state — never a corpus-sized collect. (−doc_id rides
    * the aggregate's double score: exact for ids < 2⁵³.) */
  def invertedIndex(docs: DataFrame, cap: Int = 10): DataFrame =
    docs.select(col("doc_id"),
        explode(TextHash.words(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf_doc")).as("tf"),
        graft.functions.TopKByScore.column(
          negate(col("doc_id").cast("double")), col("doc_id"), cap)
          .as("_top"))
      .select(col("term"), col("df"), col("tf"),
        array_join(
          expr("transform(_top, x -> cast(x.neighbor_id AS string))"), ",")
          .as("postings"))

  /** Hybrid retrieval: Reciprocal Rank Fusion of a BM25 keyword ranking
    * and an embedding-cosine ranking for the same query — the standard
    * lexical+semantic merge (Cormack et al.'s RRF: score = Σ 1/(k + r)).
    * `docs` supplies the lexical side (via [[bm25]]), `embeddings` the
    * semantic side (exact cosine vs the `queryVecId` vector, doc_id ≡
    * vec_id); each branch contributes its top-`kEach`, a document absent
    * from a branch contributes 0 from it, and the fused top-`kOut` is
    * returned as (doc_id, lex_rank, sem_rank, rrf) with −1 marking
    * "not in that branch's top-kEach".
    *
    * Scale shape: both branches are bounded top-k reductions (BM25's
    * TakeOrdered, the cosine TopK partial aggregate) — each yields ≤
    * kEach rows regardless of corpus size, so the fusion join is a
    * driver-trivial broadcast of two k-row sets; the corpus itself is
    * scanned once per branch and never shuffled.
    *
    * Determinism: ranks are integers (dense row_numbers over already
    * bit-reproducible orderings — BM25's rounded score and the exact
    * IEEE cosine fold — with id tiebreaks); 1.0/(kRrf + rank) is a
    * single IEEE division of integers, and the two-term sum is added in
    * fixed lex-then-sem order, so the fused double is bit-identical in
    * the SQL oracle. */
  def rrfHybrid(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
      queryVecId: Long, kEach: Int = 50, kOut: Int = 10,
      kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lexical branch: bm25 already returns ≤ kEach rows ordered by
    // (score desc, doc_id) — the un-partitioned window runs on that
    // bounded result, never on the corpus.
    val lex = bm25(docs, terms, kEach)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long")
        .as("lex_rank"))
    val sem = Similarity.knnBruteForce(
        embeddings.filter(col("vec_id") === queryVecId),
        embeddings.filter(col("vec_id") =!= queryVecId), kEach)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("sem_rank"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(-1L)).as("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("sem_rank")), lit(0.0)),
          6).as("rrf"))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(kOut)
  }
}
