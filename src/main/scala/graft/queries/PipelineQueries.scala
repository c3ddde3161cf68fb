package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Clusters, Curation, Dedup, Multimodal, Search, Serving, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators (dedup / similarity / text
  * analysis / multimodal) registered as driver-checked queries over the
  * `documents` and `embeddings` tables.
  *
  * Oracle discipline: every DuckDB oracle here recomputes the operator's
  * *semantics* (all-pairs Jaccard, full kNN, profile scoring) — not the
  * Spark implementation's internals — so a green row proves e.g. that the
  * band-bucketed LSH join found exactly the pairs a quadratic scan finds.
  * Arithmetic is constrained to exact-int counts, single double
  * divisions, and left-to-right double folds (see TextHash) so values
  * hash-match bit-for-bit.
  */
object PipelineQueries {

  /** Exact dedup: corpus doubled (ids shifted) then deduped by text md5.
    * One hash shuffle on a 32-byte key; map-side combine applies. */
  val p01 = Q.sql(
    "p01_exact_dedup",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id,
      |  count(*) AS n_copies
      |FROM corpus GROUP BY 1
      |ORDER BY canonical_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exact(corpus).orderBy(col("canonical_id"))
  }

  /** MinHash-LSH near-dup detection, verified by exact Jaccard ≥ 0.5.
    * The oracle is the INDEPENDENT quadratic all-pairs scan; equality
    * holds because b=16/r=4 has recall ≈ 1−2·10⁻⁹ at the corpus's planted
    * J≥0.9 dup margin. Spark-side work is bucket-bounded (see Dedup). */
  val p02 = Q.sql(
    "p02_minhash_lsh_dedup",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin,
    bench = true
  ) { (s, d) =>
    Dedup.minhashNearDups(Tables.documents(s, d), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash signatures (60-bit, md5-derived word hashes — pure integer
    * arithmetic, bit-exact across engines). */
  val p03 = Q.sql(
    "p03_simhash",
    """WITH wh AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS x
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN sum((x >> j) & 1) * 2 > count(*) THEN (1::BIGINT << j)
      |         ELSE 0 END AS bit
      |  FROM wh, range(0, 60) t(j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id, sum(bit)::BIGINT AS simhash
      |FROM bits GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Dedup.simhash(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Brute-force cosine top-10 for 10 query vectors — the exact-kNN
    * correctness baseline for ANN. */
  val p04 = Q.sql(
    "p04_knn_bruteforce",
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
      |  FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM p)
      |SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos_sim
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin,
    bench = true
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.knnBruteForce(e.filter(col("vec_id") < 10), e, 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-3: candidates share the query's
    * 4-hyperplane sign bucket. The oracle replays the same deterministic
    * bucketing (md5-derived integer weights), proving the Spark bucket
    * join reproduces the spec'd algorithm exactly. */
  val p05 = Q.sql(
    "p05_ann_lsh_bucketed",
    """WITH b AS (
      |  SELECT vec_id, embedding,
      |    (CASE WHEN list_sum(list_transform(range(0, 64), j ->
      |       embedding[j+1]::DOUBLE *
      |       (('0x'||substr(md5('0_'||j::VARCHAR),1,15))::BIGINT % 2001 - 1000)))
      |       > 0 THEN 1 ELSE 0 END) +
      |    (CASE WHEN list_sum(list_transform(range(0, 64), j ->
      |       embedding[j+1]::DOUBLE *
      |       (('0x'||substr(md5('1_'||j::VARCHAR),1,15))::BIGINT % 2001 - 1000)))
      |       > 0 THEN 2 ELSE 0 END) +
      |    (CASE WHEN list_sum(list_transform(range(0, 64), j ->
      |       embedding[j+1]::DOUBLE *
      |       (('0x'||substr(md5('2_'||j::VARCHAR),1,15))::BIGINT % 2001 - 1000)))
      |       > 0 THEN 4 ELSE 0 END) +
      |    (CASE WHEN list_sum(list_transform(range(0, 64), j ->
      |       embedding[j+1]::DOUBLE *
      |       (('0x'||substr(md5('3_'||j::VARCHAR),1,15))::BIGINT % 2001 - 1000)))
      |       > 0 THEN 8 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
      |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM p)
      |SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos_sim
      |FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.annLsh(e.filter(col("vec_id") < 10), e, 3, planes = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Language ID via stopword-profile scoring + CJK count; argmax with
    * tie-break by language code (struct sort — same order both engines). */
  val p06 = Q.sql(
    "p06_language_id",
    """WITH f AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w,
      |    len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, s_zh,
      |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
      |    len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is','it'))) AS s_en,
      |    len(list_filter(w, x -> x IN ('el','la','que','y','en','un','es','los'))) AS s_es,
      |    len(list_filter(w, x -> x IN ('le','la','de','et','un','est','pour','que'))) AS s_fr
      |  FROM f)
      |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
      |  list_sort([{'neg': -s_de, 'lang': 'de'}, {'neg': -s_en, 'lang': 'en'},
      |             {'neg': -s_es, 'lang': 'es'}, {'neg': -s_fr, 'lang': 'fr'},
      |             {'neg': -s_zh, 'lang': 'zh'}])[1].lang AS predicted
      |FROM s ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.languageId(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Quality features: counts + ratios + composite score. */
  val p07 = Q.sql(
    "p07_text_quality",
    """WITH f AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w, text
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    len(w) AS word_count,
      |    list_sum(list_transform(w, x -> len(x)))::BIGINT AS char_sum,
      |    len(regexp_replace(text, '[\w\s]', '', 'g')) AS punct_count,
      |    len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is','it'))) AS stop_count,
      |    len(text) AS n_chars
      |  FROM f)
      |SELECT doc_id, word_count,
      |  char_sum / word_count AS avg_word_len,
      |  punct_count / n_chars AS punct_ratio,
      |  stop_count / word_count AS stopword_ratio,
      |  stop_count / word_count * 0.5
      |    + least(word_count / 50.0, 1.0) * 0.5 AS quality_score
      |FROM c ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.quality(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + BPE-ish regex token estimate. */
  val p08 = Q.sql(
    "p08_token_count",
    """SELECT doc_id,
      |  len(string_split_regex(text, '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens,
      |  len(text) AS n_chars,
      |  len(text) / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
      |    AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.tokenCounts(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Shingle-hash fingerprints (min/max/xor-fold) — content signatures
    * for fast pre-grouping of near-identical docs. */
  val p09 = Q.sql(
    "p09_fingerprint",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_transform(
      |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                     for i in range(1, len(w)-1)]),
      |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS xs
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)
      |SELECT doc_id, list_min(xs) AS fp_min, list_max(xs) AS fp_max,
      |  list_reduce(list_prepend(0::BIGINT, xs), (a, b) -> xor(a, b)) AS fp_xor,
      |  len(xs) AS n_shingles
      |FROM sh ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Multimodal columns: binary payload + frame-sampled per-frame md5
    * features, routed through the real binary column (encode → decode). */
  val p10 = Q.sql(
    "p10_multimodal_frames",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS byte_len,
      |  n_chars::INTEGER AS width,
      |  ceil(len(text) / 64.0)::BIGINT AS n_frames,
      |  md5(substr(text, 1, 64)) AS frame0_md5,
      |  md5(substr(text, 65, 64)) AS frame1_md5
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Multimodal.frameFeatures(Multimodal.asMediaTable(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup pairs via banded LSH (8 bands × 4 planes):
    * candidates share a (band, bucket) cell, then exact-cosine verified at
    * threshold 0.45 (the corpus has no planted embedding dups, so this
    * surfaces the top natural pairs; the margin to the 0.51 max keeps the
    * threshold decision exact). The oracle replays the identical banded
    * bucketing — the all-pairs form exists only as a recall oracle in
    * PipelineSpec, never as the registered operator. */
  val p11 = Q.sql(
    "p11_cosine_neardup",
    """WITH sig AS (
      |  SELECT e.vec_id, b.b AS band, pl.p AS p,
      |    CASE WHEN list_sum(list_transform(range(0, 64), j ->
      |      e.embedding[j+1]::DOUBLE *
      |      (('0x'||substr(md5((b.b*4+pl.p)::VARCHAR||'_'||j::VARCHAR),1,15))::BIGINT
      |        % 2001 - 1000)))
      |      > 0 THEN (1 << pl.p) ELSE 0 END AS bit
      |  FROM embeddings e, range(0, 8) b(b), range(0, 4) pl(p)),
      |buck AS (
      |  SELECT vec_id, band, sum(bit)::BIGINT AS bucket
      |  FROM sig GROUP BY vec_id, band),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      |  FROM buck a JOIN buck c
      |    ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id),
      |p AS (
      |  SELECT id_a, id_b,
      |    list_sum(list_transform(range(1, 65),
      |      i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)))) AS cos
      |  FROM cand
      |  JOIN embeddings ea ON ea.vec_id = cand.id_a
      |  JOIN embeddings eb ON eb.vec_id = cand.id_b)
      |SELECT id_a, id_b, round(cos, 5) AS cos_sim
      |FROM p WHERE cos >= 0.45
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    Similarity.cosineNearDupsLsh(Tables.embeddings(s, d), 0.45)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** IVF ANN: nearest-coarse-centroid cells (centroids = the 64 vectors
    * with the smallest md5-hash-ranked vec_id — deterministic AND
    * corpus-size-independent, so the quantizer is O(cells) on the driver
    * at any scale), query searches its own cell only. The oracle replays
    * assignment + in-cell search exactly. */
  val p12 = Q.sql(
    "p12_ann_ivf",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, embedding AS qe, cell FROM asg WHERE vec_id < 10),
      |p AS (
      |  SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.qe[i]::DOUBLE * a.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))) AS cos
      |  FROM q JOIN asg a ON q.cell = a.cell AND a.vec_id <> q.qid),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM p)
      |SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos_sim
      |FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.annIvf(e.filter(col("vec_id") < 10), e, 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Gap-based sessionization over the events log (30-min gap): one
    * user_id shuffle, streaming lag + running sum, same-partition rollup. */
  val p13 = Q.sql(
    "p13_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT user_id, ts_us,
      |    (sum(new_session) OVER (PARTITION BY user_id
      |                            ORDER BY ts_us, event_id
      |                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
      |  FROM flagged)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts_us) AS start_us, max(ts_us) AS end_us,
      |  max(ts_us) - min(ts_us) AS duration_us
      |FROM sess
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin,
    bench = true
  ) { (s, d) =>
    // events.parquet is TIMESTAMP(NANOS): Tables.events reads it through
    // the scan-session clone as exact long ns (µs division is integer
    // math) — no session conf is touched here
    graft.pipeline.Sessions.sessionize(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Composed curation pipeline — the end-to-end "prepare training data"
    * shape: quality gate (≥30 words AND stopword ratio > 0.05) → exact
    * dedup vs a doubled corpus (simulating re-crawl) → per-language token
    * budget. Each stage is one of the registered operators; the
    * composition stays two shuffles (dedup groupBy + final groupBy). */
  val p14 = Q.sql(
    "p14_curation_pipeline",
    """WITH corpus AS (
      |  SELECT doc_id, lang, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, lang, text FROM documents),
      |gated AS (
      |  SELECT doc_id, lang, text,
      |    len(string_split(lower(text), ' ')) AS wc,
      |    len(list_filter(string_split(lower(text), ' '),
      |        x -> x IN ('the','a','of','to','and','in','is','it'))) AS sc
      |  FROM corpus),
      |keep AS (
      |  SELECT doc_id, lang, text FROM gated
      |  WHERE wc >= 30 AND sc / wc > 0.05),
      |dedup AS (
      |  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang,
      |    any_value(text) AS text
      |  FROM keep GROUP BY md5(text))
      |SELECT lang, count(*) AS n_docs,
      |  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))::BIGINT
      |    AS total_tokens
      |FROM dedup GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val corpus = docs.unionAll(
      docs.select((col("doc_id") + 1000000).as("doc_id"), col("lang"), col("text")))
    val w = graft.pipeline.TextHash.words(col("text"))
    val gated = corpus
      .withColumn("wc", size(w))
      .withColumn("sc", size(filter(w, x => x.isin(
        "the", "a", "of", "to", "and", "in", "is", "it"))))
      .filter(col("wc") >= 30 && col("sc") / col("wc") > 0.05)
    val deduped = gated
      .groupBy(md5(encode(col("text"), "UTF-8")))
      .agg(min(col("doc_id")).as("doc_id"), first(col("lang")).as("lang"),
        first(col("text")).as("text"))
    deduped
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")))
          .cast("long").as("total_tokens"))
      .orderBy(col("lang"))
  }

  /** Variant (v3) over semi-structured event props: parse the JSON column
    * into Spark's VariantType, extract a typed path, aggregate. The
    * variant parse + path extraction run inside codegen (no UDF, no
    * per-row JSON4S); the oracle replays the same extraction with
    * DuckDB's JSON operators. */
  val p15 = Q.sql(
    "p15_variant_extract",
    """SELECT event_type, count(*)::BIGINT AS n,
      |  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
      |  min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
      |  max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** SimHash hamming near-dup pairs (pigeonhole band buckets, exact
    * recall for hd ≤ 5 with 6 bands — see Dedup.simhashNearDups). The
    * oracle recomputes the signatures and does the quadratic hamming
    * join in SQL; the Spark plan never goes all-pairs. */
  val p16 = Q.sql(
    "p16_simhash_neardup",
    """WITH wh AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS x
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN sum((x >> j) & 1) * 2 > count(*) THEN (1::BIGINT << j)
      |         ELSE 0 END AS bit
      |  FROM wh, range(0, 60) t(j)
      |  GROUP BY doc_id, j),
      |sh AS (SELECT doc_id, sum(bit)::BIGINT AS simhash
      |       FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id
      |  AND bit_count(xor(a.simhash, b.simhash)) <= 5
      |ORDER BY id_a, id_b""".stripMargin,
    bench = true
  ) { (s, d) =>
    Dedup.simhashNearDups(Tables.documents(s, d), maxHamming = 5, bands = 6)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Audio-shaped multimodal pipeline: windowed stub energies over the
    * payload (explode → per-doc aggregate; Multimodal.waveformStats).
    * Only order-independent aggregates so the oracle is bit-exact. */
  val p17 = Q.sql(
    "p17_multimodal_waveform",
    """WITH win AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, CAST(ceil(length(text) / 32.0) AS BIGINT))) AS w
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, w,
      |    ('0x' || substr(md5(substr(text, (w * 32 + 1)::INT, 32)), 1, 15))::BIGINT
      |      / 1152921504606846976.0 AS energy
      |  FROM win)
      |SELECT doc_id, count(*)::BIGINT AS n_windows,
      |  round(max(energy), 5) AS peak_energy,
      |  arg_max(w, energy)::BIGINT AS peak_w
      |FROM e GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Multimodal.waveformStats(Multimodal.asMediaTable(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** EXACT character-5-gram Jaccard near-dup join (prefix filtering,
    * AllPairs/PPJoin family — deterministic recall, the exact counterpart
    * to p02's probabilistic MinHash). Oracle is brute-force all-pairs;
    * the Spark plan is the bounded prefix-bucket join, so a hash match
    * PROVES the prefix filter lost no pair. Jaccard is a single int/int
    * division → bit-exact. */
  val p18 = Q.sql(
    "p18_ngram_jaccard_dedup",
    """WITH gr AS (
      |  SELECT doc_id,
      |    list_distinct([substring(lower(text), i, 5)
      |                   for i in range(1, length(lower(text)) - 3)]) AS s
      |  FROM documents WHERE length(text) >= 5)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |FROM gr a, gr b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    Dedup.ngramJaccardNearDups(Tables.documents(s, d), threshold = 0.6, n = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Duplicate clusters: connected components (alternating large-star /
    * small-star) over MinHash-LSH near-dup edges (p02's verified join —
    * the shape that actually runs at 100 TB), labeling every clustered
    * doc with its component's min doc_id. The oracle recomputes the pair
    * set with an all-pairs Jaccard scan and reachability with a recursive
    * CTE — a green hash proves BOTH full LSH recall on this corpus and
    * that the distributed star contraction found exactly the transitive
    * closure's components. */
  val p19 = Q.sql(
    "p19_duplicate_clusters",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b
      |  WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      |e AS (SELECT id_a AS u, id_b AS v FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |walk(u, v) AS (
      |  SELECT u, v FROM e
      |  UNION SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u WHERE e.v <> w.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v))::BIGINT AS cluster_id
      |         FROM walk GROUP BY u)
      |SELECT doc_id, cluster_id FROM comp ORDER BY doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    Clusters.duplicateClusters(Tables.documents(s, d), threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  /** PII detect + redact over docs with deterministically planted contact
    * lines (the synthetic corpus carries no natural PII; both engines
    * append the identical spans, so counts and redacted text crosscheck
    * exactly). Per-row codegen regex — a pure map stage. */
  val p20 = Q.sql(
    "p20_pii_redaction",
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' Contact user' || doc_id ||
      |    '@example.com or +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') ||
      |    '-0199 from 10.' || (doc_id % 256) || '.0.1 today.' AS text
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |  len(regexp_extract_all(text,
      |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))::BIGINT AS n_ipv4,
      |  len(regexp_extract_all(text,
      |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g') AS redacted,
      |  true AS has_pii
      |FROM planted ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val planted = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" Contact user"), col("doc_id"),
        lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-0199 from 10."), col("doc_id") % 256, lit(".0.1 today.")).as("text"))
    TextAnalysis.pii(planted).orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: train docs sharing any word-8-gram with
    * the (deterministic) eval slice. Corpus-side plan is explode →
    * broadcast lookup → per-doc count: no corpus shuffle. */
  val p21 = Q.sql(
    "p21_decontamination",
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
      |  FROM toks, unnest(range(1, len(w) - 6)) AS t(i)),
      |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
      |shared AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_shared_grams
      |  FROM grams JOIN ev USING (g) WHERE doc_id % 50 <> 0 GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(s.n_shared_grams, 0)::BIGINT AS n_shared_grams,
      |  coalesce(s.n_shared_grams, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
      |WHERE d.doc_id % 50 <> 0
      |ORDER BY d.doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), n = 8)
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition gates: top-bigram mass fraction + duplicate
    * 4-gram occurrence fraction per doc. */
  val p22 = Q.sql(
    "p22_repetition_quality",
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
      |  FROM toks, unnest(range(1, len(w))) AS t(i)),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bi AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
      |       FROM bgc GROUP BY doc_id),
      |fg AS (
      |  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
      |  FROM toks, unnest(range(1, len(w) - 2)) AS t(i)),
      |fgc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY 1, 2),
      |four AS (SELECT doc_id,
      |           sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)
      |             AS dup_4gram_frac
      |         FROM fgc GROUP BY doc_id)
      |SELECT bi.doc_id, bi.top_bigram_frac,
      |  coalesce(four.dup_4gram_frac, 0.0) AS dup_4gram_frac
      |FROM bi LEFT JOIN four ON bi.doc_id = four.doc_id
      |ORDER BY bi.doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.repetition(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Deterministic per-domain token-budget sampling (training-mix
    * control): hash-ordered prefix per source under a running token cap. */
  val p23 = Q.sql(
    "p23_budget_sampling",
    """WITH t AS (
      |  SELECT source, doc_id,
      |    len(regexp_split_to_array(text, '\s+'))::BIGINT AS tokens,
      |    md5(doc_id::VARCHAR) AS h
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, tokens,
      |    sum(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM t)
      |SELECT source, doc_id, tokens, cum_tokens::BIGINT AS cum_tokens
      |FROM c WHERE cum_tokens <= 2000
      |ORDER BY source, doc_id""".stripMargin
  ) { (s, d) =>
    Curation.budgetSample(Tables.documents(s, d), budgetTokens = 2000L)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Sequence packing (concat-and-chunk): per-source token stream cut
    * into 512-token windows; one row per packed sequence. */
  val p24 = Q.sql(
    "p24_sequence_packing",
    """WITH t AS (
      |  SELECT source, doc_id,
      |    len(regexp_split_to_array(text, '\s+'))::BIGINT AS tokens
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, tokens,
      |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT source, ((cum - tokens) // 512)::BIGINT AS seq_id,
      |  count(*)::BIGINT AS n_docs, sum(tokens)::BIGINT AS tok_sum,
      |  min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc
      |FROM c GROUP BY source, seq_id
      |ORDER BY source, seq_id""".stripMargin
  ) { (s, d) =>
    Curation.packSequences(Tables.documents(s, d), seqLen = 512)
      .orderBy(col("source"), col("seq_id"))
  }

  /** Symmetric int8 embedding quantization — the 4× ANN memory cut.
    * floor/div/add are IEEE-identical across engines so the quantized
    * vectors hash-match exactly. */
  val p25 = Q.sql(
    "p25_embedding_quantization",
    """SELECT vec_id,
      |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale,
      |  array_to_string(
      |    CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding, x ->
      |        floor(x::DOUBLE /
      |          (list_max(list_transform(embedding, y -> abs(y::DOUBLE))) / 127.0)
      |          + 0.5)::INT)
      |    END, ',') AS q_csv
      |FROM embeddings ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    // the vector rides as CSV in the driver compare: parquet list-element
    // FIELD NAMES differ between engines and could trip a schema hash
    Similarity.quantizeInt8(Tables.embeddings(s, d))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", col("q")).as("q_csv"))
      .orderBy(col("vec_id"))
  }

  /** The composed curation DAG (decontaminate → cluster-dedup →
    * repetition gate → budget sample): one green hash proves the four
    * operators compose exactly — including full LSH recall inside the
    * composition, since the oracle recomputes clusters from an all-pairs
    * scan. */
  val p26 = Q.sql(
    "p26_curation_dag",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |grams8 AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
      |  FROM toks, unnest(range(1, len(w) - 6)) AS t(i)),
      |ev AS (SELECT DISTINCT g FROM grams8 WHERE doc_id % 50 = 0),
      |clean AS (
      |  SELECT d.doc_id FROM documents d
      |  WHERE d.doc_id % 50 <> 0
      |    AND NOT EXISTS (SELECT 1 FROM grams8 t JOIN ev USING (g)
      |                    WHERE t.doc_id = d.doc_id)),
      |sh AS (
      |  SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                                for i in range(1, len(w)-1)]) AS s
      |  FROM toks WHERE len(w) >= 3 AND doc_id IN (SELECT doc_id FROM clean)),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b
      |  WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s)+len(b.s)-len(list_intersect(a.s, b.s))) >= 0.5),
      |e AS (SELECT id_a AS u, id_b AS v FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |walk(u, v) AS (
      |  SELECT u, v FROM e
      |  UNION SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u WHERE e.v <> w.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      |         FROM walk GROUP BY u),
      |canon AS (
      |  SELECT c.doc_id FROM clean c LEFT JOIN comp ON c.doc_id = comp.doc_id
      |  WHERE comp.cluster_id IS NULL OR comp.cluster_id = c.doc_id),
      |bg AS (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
      |  FROM toks, unnest(range(1, len(w))) AS t(i)
      |  WHERE doc_id IN (SELECT doc_id FROM canon)),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |rep AS (SELECT doc_id FROM bgc GROUP BY doc_id
      |        HAVING max(c)::DOUBLE / sum(c) <= 0.05),
      |t2 AS (
      |  SELECT d.source, d.doc_id,
      |    len(regexp_split_to_array(d.text, '\s+'))::BIGINT AS tokens,
      |    md5(d.doc_id::VARCHAR) AS h
      |  FROM documents d JOIN rep USING (doc_id)),
      |c2 AS (
      |  SELECT source, doc_id, tokens,
      |    sum(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t2)
      |SELECT source, doc_id, tokens, cum::BIGINT AS cum_tokens
      |FROM c2 WHERE cum <= 1500
      |ORDER BY source, doc_id""".stripMargin
  ) { (s, d) =>
    Curation.curateCorpus(Tables.documents(s, d))
      .orderBy(col("source"), col("doc_id"))
  }

  /** SemDeDup-style semantic dedup: IVF-cluster the embeddings (same
    * hash-ranked 64-centroid quantizer as p12), then drop any vector
    * with an earlier-id same-cell member at cosine ≥ 0.35 — pairwise
    * work is confined to cells, never all-pairs. The oracle replays
    * assignment and domination exactly. */
  val p27 = Q.sql(
    "p27_semantic_dedup",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |dom AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(range(1, 65),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) >= 0.35)
      |SELECT a.vec_id, a.cell FROM asg a
      |WHERE a.vec_id NOT IN (SELECT vec_id FROM dom)
      |ORDER BY a.vec_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    Similarity.semanticDedup(Tables.embeddings(s, d), 0.35)
      .orderBy(col("vec_id"))
  }

  /** Vocabulary coverage / OOV scoring: vocab = tokens seen ≥ 3 times
    * corpus-wide; per doc, total / in-vocab / distinct-OOV token counts.
    * All-integer outputs — no cross-engine float log-prob sums. */
  val p28 = Q.sql(
    "p28_vocab_coverage",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |vocab AS (
      |  SELECT w FROM toks GROUP BY w HAVING count(*) >= 3)
      |SELECT t.doc_id, count(*) AS n_tokens,
      |  count(*) FILTER (v.w IS NOT NULL) AS in_vocab,
      |  count(DISTINCT CASE WHEN v.w IS NULL THEN t.w END) AS distinct_oov
      |FROM toks t LEFT JOIN vocab v ON t.w = v.w
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.vocabCoverage(Tables.documents(s, d), minCount = 3L)
      .orderBy(col("doc_id"))
  }

  /** Fuzzy decontamination: training docs near-duplicating an eval doc
    * (eval slice = doc_id % 20 == 0) at shingle-Jaccard ≥ 0.5, via
    * cross-corpus MinHash-LSH with the eval side broadcast. The oracle is
    * the independent quadratic train×eval scan; equality holds by the
    * same b=16/r=4 recall margin as p02. */
  val p29 = Q.sql(
    "p29_fuzzy_decontamination",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)
      |SELECT t.doc_id, e.doc_id AS eval_id,
      |  len(list_intersect(t.s, e.s)) /
      |    (len(t.s) + len(e.s) - len(list_intersect(t.s, e.s))) AS jaccard
      |FROM sh t, sh e
      |WHERE t.doc_id % 20 <> 0 AND e.doc_id % 20 = 0
      |  AND len(list_intersect(t.s, e.s)) /
      |    (len(t.s) + len(e.s) - len(list_intersect(t.s, e.s))) >= 0.5
      |ORDER BY t.doc_id, eval_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.fuzzyDecontaminate(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Per-domain corpus composition with integer parts-per-million
    * shares — the training-mix design input (exact integer division;
    * the share window runs over the already-reduced per-domain frame). */
  val p30 = Q.sql(
    "p30_domain_mix",
    """WITH t AS (
      |  SELECT source,
      |    len(regexp_split_to_array(text, '\s+'))::BIGINT AS tokens
      |  FROM documents),
      |s AS (
      |  SELECT source, count(*) AS n_docs, sum(tokens)::BIGINT AS tok_sum
      |  FROM t GROUP BY source)
      |SELECT source, n_docs, tok_sum,
      |  (tok_sum * 1000000 // sum(tok_sum) OVER ())::BIGINT AS tok_ppm,
      |  (n_docs * 1000000 // sum(n_docs) OVER ())::BIGINT AS doc_ppm
      |FROM s ORDER BY source""".stripMargin
  ) { (s, d) =>
    Curation.domainMix(Tables.documents(s, d)).orderBy(col("source"))
  }

  /** Stratified train/val/test split: exact integer per-domain quotas
    * over the md5 doc order (the salted two-pass rank — the naive
    * single-window equivalent is the oracle). */
  val p31 = Q.sql(
    "p31_stratified_split",
    """WITH t AS (
      |  SELECT source, doc_id, md5(doc_id::VARCHAR) AS h FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rank,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM t)
      |SELECT source, doc_id, rank,
      |  CASE WHEN rank * 100 <= n * 10 THEN 'test'
      |       WHEN rank * 100 <= n * 20 THEN 'val'
      |       ELSE 'train' END AS split
      |FROM r ORDER BY source, doc_id""".stripMargin
  ) { (s, d) =>
    Curation.stratifiedSplit(Tables.documents(s, d))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Corpus-level top-k 3-gram boilerplate mining (multiplicity counted,
    * gram-string tiebreak). */
  val p32 = Q.sql(
    "p32_topgram_mining",
    """WITH w AS (
      |  SELECT string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 3),
      |g AS (
      |  SELECT array_to_string(w[i:i+2], ' ') AS gram
      |  FROM w, unnest(range(1, len(w) - 1)) AS t(i))
      |SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram
      |ORDER BY n DESC, gram LIMIT 100""".stripMargin
  ) { (s, d) =>
    TextAnalysis.topGrams(Tables.documents(s, d))
  }

  /** Deterministic training shuffle: md5-bucket shard + in-shard rank. */
  val p33 = Q.sql(
    "p33_shard_shuffle",
    """WITH t AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents)
      |SELECT doc_id, substr(h, 1, 1) AS shard,
      |  row_number() OVER (PARTITION BY substr(h, 1, 1)
      |                     ORDER BY h, doc_id) AS pos
      |FROM t ORDER BY shard, pos""".stripMargin
  ) { (s, d) =>
    Curation.shardShuffle(Tables.documents(s, d))
      .orderBy(col("shard"), col("pos"))
  }

  /** As-of join (clicks ← latest prior purchase per user). The oracle is
    * DuckDB's NATIVE ASOF JOIN — an independent implementation of the
    * semantics, not a replay of our window formulation. */
  val p34 = Q.sql(
    "p34_asof_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, event_type
      |  FROM events)
      |SELECT l.event_id, l.user_id, l.ts_us, l.value,
      |  r.event_id AS r_event_id, r.ts_us AS r_ts_us, r.value AS r_value
      |FROM (SELECT * FROM e WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
      |ORDER BY l.event_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    graft.pipeline.Sessions.asOfJoin(ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(col("event_id"))
  }

  /** Range join (purchases within the 24 h before each click). Oracle is
    * DuckDB's native inequality join (IEJoin) — an independent
    * implementation of interval semantics, not our bucketed plan. */
  val p35 = Q.sql(
    "p35_range_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, event_type
      |  FROM events)
      |SELECT l.event_id, l.user_id, l.ts_us, l.value,
      |  r.event_id AS r_event_id, r.ts_us AS r_ts_us, r.value AS r_value
      |FROM (SELECT * FROM e WHERE event_type = 'click') l
      |JOIN (SELECT * FROM e WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id
      | AND r.ts_us BETWEEN l.ts_us - 86400000000 AND l.ts_us
      |ORDER BY l.event_id, r_event_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    graft.pipeline.Sessions.rangeJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      loUs = -86400L * 1000000, hiUs = 0L)
      .orderBy(col("event_id"), col("r_event_id"))
  }

  /** BM25 top-k keyword search ("dup" is the rare high-idf term). The
    * oracle recomputes idf/avgdl/score independently in DuckDB; both
    * sides round idf to 6 decimals before use and sum terms in fixed
    * query order, so ln (the only non-IEEE-exact op) never leaks ulp
    * differences into the compared values. */
  val p36 = Q.sql(
    "p36_bm25_search",
    """WITH tf AS (
      |  SELECT doc_id, len(w) AS dl,
      |    len(list_filter(w, x -> x = 'dup')) AS tf0,
      |    len(list_filter(w, x -> x = 'vector')) AS tf1,
      |    len(list_filter(w, x -> x = 'stream')) AS tf2
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
      |stat AS (
      |  SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl,
      |    count(*) FILTER (tf0 > 0) AS df0,
      |    count(*) FILTER (tf1 > 0) AS df1,
      |    count(*) FILTER (tf2 > 0) AS df2
      |  FROM tf),
      |idf AS (
      |  SELECT n, avgdl,
      |    round(ln(1 + (n - df0 + 0.5) / (df0 + 0.5)), 6) AS idf0,
      |    round(ln(1 + (n - df1 + 0.5) / (df1 + 0.5)), 6) AS idf1,
      |    round(ln(1 + (n - df2 + 0.5) / (df2 + 0.5)), 6) AS idf2
      |  FROM stat)
      |SELECT doc_id,
      |  round(idf0 * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |      + idf1 * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |      + idf2 * (tf2 * (1.2 + 1)) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
      |    4) AS score,
      |  (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END + CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
      |   + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS matched
      |FROM tf, idf
      |WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  ) { (s, d) =>
    Search.bm25(Tables.documents(s, d), Seq("dup", "vector", "stream"), k = 10)
  }

  /** CCNet-style shared-passage removal: 4-word segments occurring in
    * >= 3 distinct docs are boilerplate; documents are reassembled
    * without them. The oracle independently segments, counts, joins and
    * re-aggregates — order, tail-segment and all-removed NULL semantics
    * included. */
  val p37 = Q.sql(
    "p37_shared_segment_removal",
    """WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |    [{'o': i, 's': array_to_string(w[i*4+1:i*4+4], ' ')}
      |     for i in range(0, cast(ceil(len(w)/4.0) as int))] AS ps
      |  FROM w),
      |e AS (
      |  SELECT doc_id, unnest(ps, recursive := true) FROM segs),
      |flagged AS (
      |  SELECT s FROM e GROUP BY s HAVING count(DISTINCT doc_id) >= 3),
      |m AS (
      |  SELECT e.doc_id, e.o, e.s, f.s IS NOT NULL AS dup
      |  FROM e LEFT JOIN flagged f ON e.s = f.s)
      |SELECT doc_id, count(*)::BIGINT AS n_segs,
      |  count(*) FILTER (dup)::BIGINT AS n_removed,
      |  CASE WHEN count(*) FILTER (dup) = count(*) THEN NULL
      |       ELSE string_agg(s, ' ' ORDER BY o) FILTER (NOT dup) END AS cleaned
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.removeSharedSegments(Tables.documents(s, d))
      .orderBy(col("doc_id"))
  }

  /** Distributed k-means (2 Lloyd iterations, hash-ranked fixed-64
    * init, cosine assignment). The oracle replays both iterations:
    * argmax assignment, per-(cluster, dim) means rounded to 6 dp
    * (collapsing summation-order ulps on both engines), reassignment. */
  val p38 = Q.sql(
    "p38_kmeans_clusters",
    """WITH c0 AS (
      |  SELECT vec_id AS cid,
      |    list_transform(embedding, x -> x::DOUBLE) AS ce
      |  FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |s1 AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * c.ce[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65), i -> c.ce[i] * c.ce[i])))) AS cs
      |  FROM embeddings e, c0 c),
      |a1 AS (
      |  SELECT vec_id, embedding, cid AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
      |    FROM s1) WHERE rn = 1),
      |dm AS (
      |  SELECT cluster, d, round(avg(v), 6) AS m
      |  FROM (SELECT cluster,
      |          unnest([{'d': i, 'v': embedding[i]::DOUBLE} for i in range(1, 65)],
      |                 recursive := true)
      |        FROM a1)
      |  GROUP BY cluster, d),
      |c1 AS (SELECT cluster AS cid, list(m ORDER BY d) AS ce FROM dm GROUP BY cluster),
      |s2 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * c.ce[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65), i -> c.ce[i] * c.ce[i])))) AS cs
      |  FROM embeddings e, c1 c),
      |a2 AS (
      |  SELECT vec_id, cid AS cluster, round(cs, 5) AS cos_sim FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
      |    FROM s2) WHERE rn = 1)
      |SELECT vec_id, cluster, cos_sim FROM a2 ORDER BY vec_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    Similarity.kmeans(Tables.embeddings(s, d), cells = 64, iters = 2)
      .orderBy(col("vec_id"))
  }

  /** Temperature-reweighted (alpha = 0.5) domain sampling: quotas
    * follow sqrt(domain size) normalized over domains, filled in md5
    * doc order. Weights round before an exact decimal total, so quota
    * arithmetic is bit-identical on both engines. */
  val p39 = Q.sql(
    "p39_temperature_sampling",
    """WITH d AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source),
      |w AS (SELECT source, round(sqrt(n), 6) AS wt FROM d),
      |tot AS (SELECT sum(CAST(wt AS DECIMAL(28,6))) AS wsum FROM w),
      |q AS (SELECT source,
      |        CAST(floor(137 * wt / (SELECT wsum::DOUBLE FROM tot)) AS BIGINT) AS quota
      |      FROM w),
      |r AS (SELECT source, doc_id,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rank
      |      FROM documents)
      |SELECT r.source, r.doc_id, r.rank FROM r JOIN q USING (source)
      |WHERE r.rank <= q.quota ORDER BY source, rank""".stripMargin
  ) { (s, d) =>
    Curation.temperatureSample(Tables.documents(s, d), totalDocs = 137L)
      .orderBy(col("source"), col("rank"))
  }

  /** Gopher quality rules (Rae et al. Table A1): word-count bounds,
    * mean-word-length window, symbol-to-word ratio, alphabetic-word
    * fraction, distinct-stopword minimum — all computed as exact-int
    * ratios rounded to 5 dp before the keep verdict, so DuckDB's replay
    * is bit-identical. Pure map stage. */
  val p40 = Q.sql(
    "p40_gopher_quality",
    """WITH t AS (
      |  SELECT doc_id, text, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(w)::BIGINT AS n_words,
      |    round(list_sum(list_transform(w, x -> length(x))) / len(w), 5)
      |      AS mean_word_len,
      |    round(((length(text) - length(replace(text, '#', ''))) +
      |      (length(text) - length(replace(text, '...', ''))) // 3) / len(w), 5)
      |      AS symbol_ratio,
      |    round(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / len(w), 5)
      |      AS alpha_ratio,
      |    len(list_intersect(list_distinct(w),
      |      ['the','be','to','of','and','that','have','with','a','in']))::BIGINT
      |      AS stop_hits
      |  FROM t)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
      |  stop_hits,
      |  CASE WHEN n_words BETWEEN 50 AND 100000
      |        AND mean_word_len BETWEEN 3.0 AND 10.0
      |        AND symbol_ratio < 0.1 AND alpha_ratio > 0.8
      |        AND stop_hits >= 2 THEN 1 ELSE 0 END::BIGINT AS keep
      |FROM m ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.gopherQuality(Dedup.spreadNarrow(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** Within-domain quality-percentile filter: each source keeps its top
    * half by distinct-word-ratio score (desc, doc_id tie-break) — the
    * post-scoring curation cut of a mixture pipeline. One shuffle on
    * the domain key; the oracle replays the ranked window. */
  val p41 = Q.sql(
    "p41_domain_quality_filter",
    """WITH scored AS (
      |  SELECT source, doc_id,
      |    round(len(list_distinct(string_split(lower(text), ' '))) /
      |      len(string_split(lower(text), ' ')), 6) AS score
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, score,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY score DESC, doc_id) AS rnk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM scored)
      |SELECT source, doc_id, score, rnk::BIGINT AS rnk
      |FROM ranked WHERE rnk <= ceil(n * 0.5)
      |ORDER BY source, rnk""".stripMargin
  ) { (s, d) =>
    TextAnalysis.domainQualityFilter(Tables.documents(s, d), frac = 0.5)
      .orderBy(col("source"), col("rnk"))
  }

  /** DSIR importance weights: per-doc Σ log(P_target/P_corpus) over
    * add-1-smoothed unigrams (target = the doc_id%20 eval slice, same
    * convention as p21/p29). Per-word ratios quantized to micro-log
    * integers BEFORE the per-doc LONG sum, so the score is summation-
    * order-free and the oracle hash-matches despite `ln` being involved. */
  val p42 = Q.sql(
    "p42_dsir_weights",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |cc AS (SELECT w, count(*) AS cc FROM toks GROUP BY w),
      |tc AS (SELECT w, count(*) AS tc FROM toks WHERE doc_id % 20 = 0 GROUP BY w),
      |tot AS (SELECT (SELECT count(*) FROM toks) AS cn,
      |               (SELECT count(*) FROM toks WHERE doc_id % 20 = 0) AS tn,
      |               (SELECT count(*) FROM cc) AS v),
      |r AS (
      |  SELECT cc.w,
      |    CAST(round((ln((coalesce(tc.tc, 0) + 1.0) / (tot.tn + tot.v)) -
      |                ln((cc.cc + 1.0) / (tot.cn + tot.v))) * 1000000)
      |      AS BIGINT) AS lr
      |  FROM cc LEFT JOIN tc ON cc.w = tc.w, tot)
      |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(r.lr)::BIGINT AS score_micro
      |FROM toks t JOIN r ON t.w = r.w
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    Curation.dsirWeights(Tables.documents(s, d), evalMod = 20)
      .orderBy(col("doc_id"))
  }

  /** BPE-step pair counts (tokenizer-training prep): top-100 adjacent
    * char pairs inside words, map-side-combined over the bounded
    * bigram key space, TakeOrdered with a pair tie-break. */
  val p43 = Q.sql(
    "p43_bpe_pair_counts",
    """WITH w AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
      |p AS (
      |  SELECT unnest([substring(w, i, 2) for i in range(1, length(w))]) AS pair
      |  FROM w WHERE length(w) >= 2)
      |SELECT pair, count(*)::BIGINT AS n
      |FROM p GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 100""".stripMargin
  ) { (s, d) =>
    TextAnalysis.bpePairCounts(Tables.documents(s, d), k = 100)
  }

  /** CCNet-style unigram perplexity gate: corpus-trained unigram LM,
    * per-doc total NLL in micro-log integer units (summation-order-free
    * LONG sum) and the integer mean-NLL bucket that splits the corpus
    * head/middle/tail. */
  val p44 = Q.sql(
    "p44_unigram_perplexity",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |cc AS (SELECT w, count(*) AS cc FROM toks GROUP BY w),
      |tot AS (SELECT count(*) AS n FROM toks),
      |r AS (
      |  SELECT cc.w,
      |    CAST(round(-ln(cc.cc / tot.n) * 1000000) AS BIGINT) AS nw
      |  FROM cc, tot)
      |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(r.nw)::BIGINT AS nll_micro,
      |  (sum(r.nw)::BIGINT // (count(*)::BIGINT * 1000000)) AS ppl_bucket
      |FROM toks t JOIN r ON t.w = r.w
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    Curation.unigramPerplexity(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Per-doc duplicated-span fraction (Lee et al. EXACTSUBSTR statistic
    * at 6-word-window granularity, stride 1): spans occurring in ≥2
    * distinct docs are "duplicated"; each doc reports its coverage in
    * integer permille. */
  val p45 = Q.sql(
    "p45_dup_spans",
    """WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) >= 6
      |      THEN [array_to_string(w[i+1:i+6], ' ') for i in range(0, len(w)-5)]
      |      ELSE [] END AS ss
      |  FROM w),
      |e AS (SELECT doc_id, unnest(ss) AS s FROM sp),
      |dup AS (SELECT s FROM e GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
      |agg AS (
      |  SELECT e.doc_id, count(*)::BIGINT AS n_spans, count(d.s)::BIGINT AS n_dup
      |  FROM e LEFT JOIN dup d ON e.s = d.s GROUP BY e.doc_id)
      |SELECT w.doc_id, coalesce(a.n_spans, 0)::BIGINT AS n_spans,
      |  coalesce(a.n_dup, 0)::BIGINT AS n_dup,
      |  CASE WHEN coalesce(a.n_spans, 0) > 0
      |    THEN (1000 * a.n_dup) // a.n_spans END AS dup_permille
      |FROM w LEFT JOIN agg a ON w.doc_id = a.doc_id
      |ORDER BY w.doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    TextAnalysis.dupSpans(Dedup.spreadNarrow(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** Label-centroid margin (CLIP-score-style consistency gate),
    * integer-exact: int8-quantized vectors, LONG centroid sums, one
    * IEEE division per (vector, label) — see Similarity scaladoc. The
    * oracle replays quantization, centroid sums and the argmax with
    * the same smallest-label tie-break. */
  val p46 = Q.sql(
    "p46_label_centroid_margin",
    """WITH q AS (
      |  SELECT vec_id, label,
      |    CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding, x ->
      |        floor(x::DOUBLE /
      |          (list_max(list_transform(embedding, y -> abs(y::DOUBLE))) / 127.0)
      |          + 0.5)::INT)
      |    END AS q
      |  FROM embeddings),
      |cd AS (
      |  SELECT label,
      |    unnest([{'d': i, 'v': q[i]} for i in range(1, len(q)+1)],
      |           recursive := true)
      |  FROM q),
      |cl AS (
      |  SELECT label AS l, list(cs ORDER BY d) AS cv FROM (
      |    SELECT label, d, sum(v)::BIGINT AS cs FROM cd GROUP BY label, d)
      |  GROUP BY label),
      |n AS (SELECT label AS l, count(*)::BIGINT AS n FROM q GROUP BY label),
      |sc AS (
      |  SELECT q.vec_id, q.label, cl.l,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.q[i]::BIGINT * cl.cv[i]))::DOUBLE / n.n AS m
      |  FROM q, cl JOIN n ON cl.l = n.l),
      |agg AS (
      |  SELECT vec_id, label,
      |    CAST(round(max(CASE WHEN l = label THEN m END) * 1000000) AS BIGINT)
      |      AS own_micro,
      |    max(CASE WHEN l <> label THEN m END) AS bo
      |  FROM sc GROUP BY vec_id, label),
      |bl AS (
      |  SELECT s.vec_id, min(s.l) AS best_other_label
      |  FROM sc s JOIN agg a ON s.vec_id = a.vec_id
      |  WHERE s.l <> s.label AND s.m = a.bo GROUP BY s.vec_id)
      |SELECT a.vec_id, a.label, a.own_micro, bl.best_other_label,
      |  CAST(round(a.bo * 1000000) AS BIGINT) AS best_other_micro,
      |  a.own_micro >= CAST(round(a.bo * 1000000) AS BIGINT) AS aligned
      |FROM agg a JOIN bl ON a.vec_id = bl.vec_id
      |ORDER BY a.vec_id""".stripMargin
  ) { (s, d) =>
    Similarity.labelCentroidMargin(Tables.embeddings(s, d))
      .orderBy(col("vec_id"))
  }

  /** Conversion funnel view→click→purchase, strict order inside a
    * 7-day window from step 1 (Amplitude/Mixpanel semantics): one
    * shuffle on user_id, per-step conditional mins over one window
    * partitioning. */
  val p47 = Q.sql(
    "p47_funnel",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |t1 AS (SELECT user_id, min(ts_us) AS t1_us
      |       FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us
      |       FROM e JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'click' AND e.ts_us >= t1.t1_us
      |         AND e.ts_us - t1.t1_us <= 604800000000
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us
      |       FROM e JOIN t2 ON e.user_id = t2.user_id
      |            JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts_us >= t2.t2_us
      |         AND e.ts_us - t1.t1_us <= 604800000000
      |       GROUP BY e.user_id)
      |SELECT u.user_id, t1.t1_us, t2.t2_us, t3.t3_us,
      |  (CASE WHEN t1.t1_us IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN t2.t2_us IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN t3.t3_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |    AS steps_completed
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN t1 ON u.user_id = t1.user_id
      |LEFT JOIN t2 ON u.user_id = t2.user_id
      |LEFT JOIN t3 ON u.user_id = t3.user_id
      |ORDER BY u.user_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    graft.pipeline.Sessions.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention: users cohorted by epoch-aligned first-event
    * week; distinct actives per (cohort_week, week offset 0..4). */
  val p48 = Q.sql(
    "p48_cohort_retention",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
      |c AS (SELECT user_id, min(ts_us) // 604800000000 AS cohort_week
      |      FROM e GROUP BY user_id),
      |k AS (SELECT DISTINCT e.user_id, c.cohort_week,
      |        (e.ts_us // 604800000000) - c.cohort_week AS week_k
      |      FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE (e.ts_us // 604800000000) - c.cohort_week <= 4)
      |SELECT cohort_week, week_k, count(*)::BIGINT AS n_users
      |FROM k GROUP BY cohort_week, week_k
      |ORDER BY cohort_week, week_k""".stripMargin
  ) { (s, d) =>
    graft.pipeline.Sessions.cohortRetention(Tables.events(s, d), maxWeeks = 4)
      .orderBy(col("cohort_week"), col("week_k"))
  }

  /** Multimodal fingerprint near-dup: pHash-style 60-bit block signature
    * over the (stub-decoded) payload, pairs within hamming ≤ 5 via the
    * same banded pigeonhole join as text simhash (exact recall for
    * hd < bands, so the all-pairs oracle matches bit-for-bit). */
  val p49 = Q.sql(
    "p49_media_phash_neardup",
    """WITH sig AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(0, 60), b ->
      |      ((('0x' || substr(md5(substr(text, b*8+1, 8)), 1, 15))::BIGINT & 1)
      |        * (1::BIGINT << b))))::BIGINT AS phash
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
      |FROM sig a, sig b
      |WHERE a.doc_id < b.doc_id
      |  AND bit_count(xor(a.phash, b.phash)) <= 5
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    Multimodal.phashNearDups(
        Multimodal.asMediaTable(Tables.documents(s, d)), maxHamming = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Feature-hashed bag-of-words embedding (hashing trick): signed
    * counts in hash(w) mod 64 dims, integer-exact, one single-pass
    * aggregate. CSV output keeps list schemas engine-neutral. */
  val p50 = Q.sql(
    "p50_feature_hash_embed",
    """WITH toks AS (
      |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS x
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)),
      |cell AS (
      |  SELECT doc_id, x % 64 AS d,
      |    CASE WHEN (x >> 12) & 1 = 1 THEN 1 ELSE -1 END AS s
      |  FROM toks),
      |g AS (SELECT doc_id, d, sum(s)::BIGINT AS v FROM cell GROUP BY doc_id, d),
      |f AS (SELECT u.doc_id, r.d
      |      FROM (SELECT DISTINCT doc_id FROM toks) u, range(0, 64) r(d))
      |SELECT f.doc_id,
      |  array_to_string(list(coalesce(g.v, 0) ORDER BY f.d), ',') AS v_csv
      |FROM f LEFT JOIN g ON f.doc_id = g.doc_id AND f.d = g.d
      |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.featureHashEmbed(Tables.documents(s, d), dims = 64)
      .orderBy(col("doc_id"))
  }

  /** Windowed PMI pair mining: top-100 co-occurring word pairs (forward
    * window 4), PMI in micro-log integers. Only the 100 winners join the
    * unigram table (broadcast). */
  val p51 = Q.sql(
    "p51_pmi_pairs",
    """WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |pi AS (SELECT doc_id, w, unnest(range(0, len(w) - 1)) AS i
      |       FROM w WHERE len(w) >= 2),
      |pj AS (SELECT w, i, unnest(range(i + 1, least(i + 4, len(w) - 1) + 1)) AS j
      |       FROM pi),
      |pr AS (SELECT least(w[i+1], w[j+1]) AS a, greatest(w[i+1], w[j+1]) AS b
      |       FROM pj),
      |pc AS (SELECT a, b, count(*) AS c FROM pr GROUP BY a, b),
      |uni AS (SELECT t AS wd, count(*) AS cw
      |        FROM (SELECT unnest(w) AS t FROM w) GROUP BY t),
      |tot AS (SELECT (SELECT count(*) FROM (SELECT unnest(w) FROM w)) AS ntok,
      |               (SELECT sum(c) FROM pc) AS npair),
      |top AS (SELECT a, b, c FROM pc ORDER BY c DESC, a, b LIMIT 100)
      |SELECT t.a, t.b, t.c::BIGINT AS n_pair,
      |  CAST(round(ln((t.c / tot.npair) /
      |    ((ua.cw / tot.ntok) * (ub.cw / tot.ntok))) * 1000000) AS BIGINT)
      |    AS pmi_micro
      |FROM top t JOIN uni ua ON t.a = ua.wd JOIN uni ub ON t.b = ub.wd, tot
      |ORDER BY n_pair DESC, a, b""".stripMargin,
    bench = true
  ) { (s, d) =>
    TextAnalysis.pmiPairs(Dedup.spreadNarrow(Tables.documents(s, d)),
      window = 4, k = 100)
  }

  /** Exact per-type value percentiles (type-7 interpolation shared by
    * Spark `percentile` and DuckDB `quantile_cont`); the
    * percentile_approx swap-in is the 100 TB path. */
  val p52 = Q.sql(
    "p52_value_percentiles",
    """SELECT event_type, count(*)::BIGINT AS n,
      |  round(quantile_cont(value, 0.25), 5) AS p25,
      |  round(quantile_cont(value, 0.5), 5) AS p50,
      |  round(quantile_cont(value, 0.75), 5) AS p75,
      |  round(quantile_cont(value, 0.95), 5) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    graft.pipeline.Sessions.valuePercentiles(Tables.events(s, d))
      .orderBy(col("event_type"))
  }

  /** Incremental ingestion dedup: new batch (doc_id%10=7) vs the
    * existing index — LSH-bucketed cross join + exact-Jaccard verify;
    * every new doc reports (n_dups, first_match). Oracle is the
    * all-pairs cross scan (same recall argument as p02). */
  val p53 = Q.sql(
    "p53_incremental_dedup",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |m AS (
      |  SELECT n.doc_id AS new_id, count(*)::BIGINT AS n_dups,
      |    min(i.doc_id) AS first_match
      |  FROM sh n JOIN sh i
      |    ON n.doc_id % 10 = 7 AND i.doc_id % 10 <> 7
      |    AND len(list_intersect(n.s, i.s)) /
      |      (len(n.s) + len(i.s) - len(list_intersect(n.s, i.s))) >= 0.5
      |  GROUP BY n.doc_id)
      |SELECT d.doc_id AS new_id, coalesce(m.n_dups, 0)::BIGINT AS n_dups,
      |  m.first_match
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
      |LEFT JOIN m ON d.doc_id = m.new_id
      |ORDER BY new_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.incrementalDedup(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7), threshold = 0.5)
      .orderBy(col("new_id"))
  }

  /** RAG chunking: 32-word windows at stride 24 (8-word overlap), pure
    * map + bounded explode — a pass-through projection at 100 TB. */
  val p54 = Q.sql(
    "p54_rag_chunking",
    """WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    unnest([{'ci': i, 'st': i*24,
      |             'nw': len(w[i*24+1:i*24+32]),
      |             'ct': array_to_string(w[i*24+1:i*24+32], ' ')}
      |            for i in range(0, ((len(w)-1)//24)+1)],
      |           recursive := true)
      |  FROM w)
      |SELECT doc_id, ci::BIGINT AS chunk_idx, st::BIGINT AS start_word,
      |  nw::BIGINT AS n_words, ct AS chunk_text
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  ) { (s, d) =>
    Curation.chunkDocs(Tables.documents(s, d), chunkWords = 32, strideWords = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Hard-negative mining: per anchor, the highest-cosine OTHER-label
    * vector inside its IVF cell (cell-confined — O(cell²), bounded by
    * the census cap). The oracle replays assignment + in-cell ranking
    * with the same (cos desc, neg_id) tie-break. */
  val p55 = Q.sql(
    "p55_hard_negatives",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, e.label, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, label, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |pr AS (
      |  SELECT a.vec_id, a.label, b.vec_id AS neg_id, b.label AS neg_label,
      |    list_sum(list_transform(range(1, 65),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS cos
      |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.label <> b.label),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id
      |                               ORDER BY cos DESC, neg_id) AS rn
      |  FROM pr)
      |SELECT vec_id, label, neg_id, neg_label, round(cos, 5) AS cos_sim
      |FROM rk WHERE rn = 1 ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    Similarity.hardNegatives(Tables.embeddings(s, d))
      .orderBy(col("vec_id"))
  }

  /** Round-6 pipeline composition: Gopher gate → dup-span gate →
    * decontamination → chunking → per-source rollup. The oracle replays
    * all four stages; one green hash proves they compose exactly. */
  val p56 = Q.sql(
    "p56_pretrain_pipeline",
    """WITH t AS (
      |  SELECT doc_id, text, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(w)::BIGINT AS n_words,
      |    round(list_sum(list_transform(w, x -> length(x))) / len(w), 5)
      |      AS mean_word_len,
      |    round(((length(text) - length(replace(text, '#', ''))) +
      |      (length(text) - length(replace(text, '...', ''))) // 3) / len(w), 5)
      |      AS symbol_ratio,
      |    round(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / len(w), 5)
      |      AS alpha_ratio,
      |    len(list_intersect(list_distinct(w),
      |      ['the','be','to','of','and','that','have','with','a','in']))::BIGINT
      |      AS stop_hits
      |  FROM t),
      |q1 AS (
      |  SELECT t.doc_id, t.w FROM t JOIN m ON t.doc_id = m.doc_id
      |  WHERE m.n_words BETWEEN 50 AND 100000
      |    AND m.mean_word_len BETWEEN 3.0 AND 10.0
      |    AND m.symbol_ratio < 0.1 AND m.alpha_ratio > 0.8
      |    AND m.stop_hits >= 2),
      |e AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(w[i+1:i+6], ' ')
      |            for i in range(0, len(w)-5)]) AS s
      |  FROM q1 WHERE len(w) >= 6),
      |occ AS (SELECT s, doc_id, count(*) AS occ FROM e GROUP BY s, doc_id),
      |nd AS (SELECT s FROM occ GROUP BY s HAVING count(*) >= 2),
      |dupc AS (SELECT occ.doc_id, sum(occ.occ)::BIGINT AS n_dup
      |         FROM occ JOIN nd ON occ.s = nd.s GROUP BY occ.doc_id),
      |q2 AS (
      |  SELECT q1.doc_id, q1.w FROM q1
      |  LEFT JOIN dupc d ON q1.doc_id = d.doc_id
      |  WHERE (1000 * coalesce(d.n_dup, 0)) // greatest(len(q1.w)-5, 1) < 500),
      |tr AS (SELECT doc_id, w FROM q2 WHERE doc_id % 50 <> 0),
      |evg AS (
      |  SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g
      |  FROM t, unnest(range(1, len(w) - 6)) r(i) WHERE doc_id % 50 = 0),
      |trg AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
      |  FROM tr, unnest(range(1, len(w) - 6)) r(i)),
      |cont AS (SELECT DISTINCT trg.doc_id FROM trg JOIN evg USING (g)),
      |q3 AS (SELECT tr.doc_id, tr.w FROM tr
      |       WHERE tr.doc_id NOT IN (SELECT doc_id FROM cont)),
      |c AS (
      |  SELECT doc_id,
      |    unnest([len(w[i*24+1:i*24+32])
      |            for i in range(0, ((len(w)-1)//24)+1)]) AS nw
      |  FROM q3)
      |SELECT d.source, count(DISTINCT c.doc_id)::BIGINT AS n_docs,
      |  count(*)::BIGINT AS n_chunks, sum(c.nw)::BIGINT AS n_words
      |FROM c JOIN documents d ON c.doc_id = d.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin,
    bench = true
  ) { (s, d) =>
    Curation.pretrainPipeline(Tables.documents(s, d), evalMod = 50)
      .orderBy(col("source"))
  }

  /** One BPE merge iteration past p43: top pair → corpus-wide merge to
    * a placeholder symbol (`replace` left-to-right semantics in both
    * engines) → recount symbol pairs → top-20 expanded. Proves the
    * iterative trainer's merge→recount cycle composes. */
  val p57 = Q.sql(
    "p57_bpe_merge_step",
    """WITH w0 AS (
      |  SELECT w FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
      |                 FROM documents)
      |  WHERE length(w) >= 2),
      |t1 AS (
      |  SELECT pair FROM (
      |    SELECT unnest([substring(w, i, 2) for i in range(1, length(w))])
      |      AS pair FROM w0)
      |  GROUP BY pair ORDER BY count(*) DESC, pair LIMIT 1),
      |wm AS (SELECT replace(w0.w, t1.pair, chr(1)) AS w FROM w0, t1),
      |cnt AS (
      |  SELECT pair, count(*)::BIGINT AS n FROM (
      |    SELECT unnest([substring(w, i, 2) for i in range(1, length(w))])
      |      AS pair FROM wm WHERE length(w) >= 2)
      |  GROUP BY pair ORDER BY n DESC, pair LIMIT 20)
      |SELECT replace(substring(c.pair, 1, 1), chr(1), t1.pair) AS sym_a,
      |  replace(substring(c.pair, 2, 1), chr(1), t1.pair) AS sym_b, c.n
      |FROM cnt c, t1
      |ORDER BY n DESC, sym_a, sym_b""".stripMargin
  ) { (s, d) =>
    TextAnalysis.bpeMergeStep(Tables.documents(s, d), k = 20)
  }

  /** Per-source KMV distinct-token sketch via the native bounded
    * aggregate (graft.functions.KmvSketch): k smallest distinct hashes,
    * estimate (k−1)·2^60/kth. The oracle replays the k-smallest-distinct
    * ordering exactly; `true_distinct` verifies the estimate is within
    * the expected KMV error on this corpus. */
  val p58 = Q.sql(
    "p58_distinct_sketch_per_source",
    """WITH h AS (
      |  SELECT DISTINCT source, ('0x' || substr(md5(w), 1, 15))::BIGINT AS x
      |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)),
      |r AS (SELECT source, x,
      |        row_number() OVER (PARTITION BY source ORDER BY x) AS rn
      |      FROM h),
      |agg AS (SELECT source, count(*)::BIGINT AS n_kept, max(x) AS kth
      |        FROM r WHERE rn <= 16 GROUP BY source),
      |tot AS (SELECT source, count(*)::BIGINT AS true_distinct
      |        FROM h GROUP BY source)
      |SELECT a.source, a.n_kept,
      |  CASE WHEN a.n_kept < 16 THEN a.n_kept
      |       ELSE CAST(round(15 * 1152921504606846976.0 / a.kth) AS BIGINT)
      |  END AS est_distinct,
      |  t.true_distinct
      |FROM agg a JOIN tot t ON a.source = t.source
      |ORDER BY a.source""".stripMargin
  ) { (s, d) =>
    TextAnalysis.distinctTokenSketch(Tables.documents(s, d), k = 16)
      .orderBy(col("source"))
  }

  /** Integer-exact daily anomaly gate: |z|>3 over the 7 preceding
    * observed days, evaluated as 2·(7n−S)² > 21·(7·SS−S²) — pure
    * integer arithmetic, bit-exact by construction. */
  val p59 = Q.sql(
    "p59_daily_anomalies",
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*)::BIGINT AS n
      |  FROM events GROUP BY event_type, day),
      |w AS (
      |  SELECT event_type, day, n,
      |    count(*) OVER tw AS h,
      |    sum(n) OVER tw AS s7,
      |    sum(n * n) OVER tw AS ss7
      |  FROM d
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, n,
      |  CASE WHEN h = 7 THEN
      |    2 * (7*n - s7) * (7*n - s7) > 21 * (7*ss7 - s7*s7)
      |  END AS anomaly
      |FROM w ORDER BY event_type, day""".stripMargin
  ) { (s, d) =>
    graft.pipeline.Sessions.dailyAnomalies(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))
  }

  /** Gap-filled hourly series over the dense (type × hour) grid with a
    * trailing 3-hour moving sum; missing hours surface as zeros. */
  val p60 = Q.sql(
    "p60_dense_hourly_series",
    """WITH c AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
      |    count(*)::BIGINT AS cnt
      |  FROM events GROUP BY event_type, hour),
      |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM c),
      |g AS (
      |  SELECT t.event_type, h.hour
      |  FROM (SELECT DISTINCT event_type FROM c) t,
      |       b, unnest(range(b.lo, b.hi + 1)) h(hour)),
      |f AS (
      |  SELECT g.event_type, g.hour, coalesce(c.cnt, 0)::BIGINT AS n
      |  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour)
      |SELECT event_type, hour, n,
      |  sum(n) OVER (PARTITION BY event_type ORDER BY hour
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT AS sum3h
      |FROM f ORDER BY event_type, hour""".stripMargin
  ) { (s, d) =>
    graft.pipeline.Sessions.denseHourlySeries(Tables.events(s, d))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Exact heavy hitters (count > N/100) with ppm shares — the
    * oracle-checkable counterpart of the bounded Space-Saving sketch
    * (spec-pinned containment guarantee). */
  val p61 = Q.sql(
    "p61_heavy_hitters",
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS wd FROM documents),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT t.wd, count(*)::BIGINT AS n,
      |  ((1000000 * count(*)) // (SELECT n FROM tot))::BIGINT AS share_ppm
      |FROM toks t
      |GROUP BY t.wd HAVING count(*) * 100 > (SELECT n FROM tot)
      |ORDER BY wd""".stripMargin
  ) { (s, d) =>
    TextAnalysis.heavyHitters(Tables.documents(s, d), k = 100)
      .orderBy(col("wd"))
  }

  /** TF-IDF top-3 terms per doc, micro-quantized before ranking so the
    * per-doc argmax is integer-deterministic. */
  val p62 = Q.sql(
    "p62_tfidf_top_terms",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd
      |  FROM documents),
      |nn AS (SELECT count(*) AS n FROM documents),
      |tf AS (SELECT doc_id, wd, count(*) AS tf FROM toks GROUP BY doc_id, wd),
      |df AS (SELECT wd, count(*) AS df
      |       FROM (SELECT DISTINCT doc_id, wd FROM toks) GROUP BY wd),
      |sc AS (
      |  SELECT tf.doc_id, tf.wd,
      |    tf.tf * CAST(round(ln((SELECT n FROM nn)::DOUBLE / df.df) * 1000000)
      |      AS BIGINT) AS score_micro
      |  FROM tf JOIN df ON tf.wd = df.wd),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY score_micro DESC, wd) AS rank FROM sc)
      |SELECT doc_id, rank::BIGINT AS rank, wd, score_micro
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  ) { (s, d) =>
    TextAnalysis.tfidfTopTerms(Tables.documents(s, d), k = 3)
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Per-source KL divergence from the corpus unigram mixture in
    * micro-nats — corpus-composition drift analysis, DSIR-convention
    * micro-log quantization before the LONG sum. */
  val p63 = Q.sql(
    "p63_source_kl_divergence",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS wd
      |  FROM documents),
      |sw AS (SELECT source, wd, count(*) AS c_sw
      |       FROM toks GROUP BY source, wd),
      |cw AS (SELECT wd, count(*) AS c_w FROM toks GROUP BY wd),
      |ts AS (SELECT source, count(*) AS n_s FROM toks GROUP BY source),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT sw.source, ts.n_s AS n_tokens,
      |  (sum(sw.c_sw * CAST(round(ln((sw.c_sw / ts.n_s) /
      |      (cw.c_w / (SELECT n FROM tot)::DOUBLE)) * 1000000) AS BIGINT))
      |    // ts.n_s)::BIGINT AS kl_micro
      |FROM sw JOIN cw ON sw.wd = cw.wd JOIN ts ON sw.source = ts.source
      |GROUP BY sw.source, ts.n_s ORDER BY sw.source""".stripMargin
  ) { (s, d) =>
    TextAnalysis.sourceKlDivergence(Tables.documents(s, d))
      .orderBy(col("source"))
  }

  /** Cross-source duplication matrix: near-dup pairs bucketed by
    * unordered source pair — which domains mirror each other. */
  val p64 = Q.sql(
    "p64_cross_source_dups",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b
      |  WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
      |SELECT least(da.source, db.source) AS source_a,
      |  greatest(da.source, db.source) AS source_b,
      |  count(*)::BIGINT AS n_pairs
      |FROM pr
      |JOIN documents da ON pr.id_a = da.doc_id
      |JOIN documents db ON pr.id_b = db.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    Clusters.crossSourceDupMatrix(Tables.documents(s, d), threshold = 0.5)
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Quality-aware canonical selection inside duplicate clusters:
    * highest distinct-word-ratio member (micro-quantized, doc_id
    * tie-break) marked canonical. */
  val p65 = Q.sql(
    "p65_canonical_by_quality",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b
      |  WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      |e AS (SELECT id_a AS u, id_b AS v FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |walk(u, v) AS (
      |  SELECT u, v FROM e
      |  UNION SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u WHERE e.v <> w.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v))::BIGINT AS cluster_id
      |         FROM walk GROUP BY u),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(round(len(list_distinct(string_split(lower(text), ' ')))
      |      * 1000000.0 / len(string_split(lower(text), ' '))) AS BIGINT)
      |      AS score_micro
      |  FROM documents),
      |r AS (
      |  SELECT c.doc_id, c.cluster_id, sc.score_micro,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |                       ORDER BY sc.score_micro DESC, c.doc_id) AS rn
      |  FROM comp c JOIN sc ON c.doc_id = sc.doc_id)
      |SELECT doc_id, cluster_id, score_micro, rn = 1 AS canonical
      |FROM r ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Clusters.canonicalByQuality(Tables.documents(s, d), threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  /** The MinHash permutation constants, inlined into SQL oracles that
    * must reproduce the signatures exactly (p66). */
  private val permValues: String = (0 until 64).map { i =>
    val (a, b) = Dedup.perm(i); s"($i,$a,$b)"
  }.mkString(", ")

  /** LSH recall audit per Jaccard decile: ground truth from the lossless
    * prefix-filter join, candidates from the banded buckets. The oracle
    * recomputes BOTH sides from scratch — all-pairs Jaccard for truth and
    * the actual 64 minhash permutations for the bands — so a green row
    * certifies the prefix filter (exact pair set) AND the bucketing
    * (exact candidate set), not just the summary arithmetic. */
  val p66 = Q.sql(
    "p66_lsh_recall_audit",
    s"""WITH sh AS (
      |  SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |truth AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
      |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.25),
      |x AS (SELECT doc_id,
      |        ('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 AS x
      |      FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
      |perms AS (SELECT * FROM (VALUES $permValues) t(i, a, b)),
      |mins AS (SELECT doc_id, i, min((a * x + b) % 2147483647) AS m
      |         FROM x, perms GROUP BY doc_id, i),
      |bands AS (SELECT doc_id, i // 4 AS band_idx,
      |            string_agg(m::VARCHAR, '_' ORDER BY i) AS band_key
      |          FROM mins GROUP BY doc_id, i // 4),
      |cand AS (SELECT DISTINCT s1.doc_id AS id_a, s2.doc_id AS id_b
      |         FROM bands s1 JOIN bands s2
      |           ON s1.band_idx = s2.band_idx AND s1.band_key = s2.band_key
      |             AND s1.doc_id < s2.doc_id)
      |SELECT CAST(floor(t.j * 10) AS BIGINT) AS decile,
      |  count(*)::BIGINT AS n_true,
      |  sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
      |  sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT * 1000
      |    // count(*)::BIGINT AS recall_permille
      |FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
      |GROUP BY 1 ORDER BY decile""".stripMargin
  ) { (s, d) =>
    Dedup.lshRecallAudit(Tables.documents(s, d), threshold = 0.25)
      .orderBy(col("decile"))
  }

  /** Near-dup pairs that straddle train/val/test split boundaries —
    * the eval-contamination audit every dedup-then-split pipeline gates
    * on. */
  val p67 = Q.sql(
    "p67_split_leakage",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      |t AS (SELECT source, doc_id, md5(doc_id::VARCHAR) AS h FROM documents),
      |r AS (SELECT source, doc_id,
      |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rank,
      |        count(*) OVER (PARTITION BY source) AS n FROM t),
      |sp AS (SELECT doc_id,
      |        CASE WHEN rank * 100 <= n * 10 THEN 'test'
      |             WHEN rank * 100 <= n * 20 THEN 'val'
      |             ELSE 'train' END AS split FROM r)
      |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b,
      |  p.jaccard
      |FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
      |  JOIN sp sb ON p.id_b = sb.doc_id
      |WHERE sa.split <> sb.split
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    Curation.splitLeakage(Tables.documents(s, d), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Winnowing (MOSS) fingerprint selection: 5-char gram hashes, window
    * 4, rightmost-minimum rule — positioned local fingerprints with the
    * ≥ k+w−1 shared-substring guarantee. */
  val p68 = Q.sql(
    "p68_winnowing_fingerprints",
    """WITH g AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(substring(lower(text), i, 5)), 1, 15))::BIGINT
      |     for i in range(1, length(text) - 3)] AS hs
      |  FROM documents WHERE length(text) >= 8),
      |sel AS (
      |  SELECT doc_id, hs,
      |    unnest(list_distinct(
      |      [p + 4 - list_position(list_reverse(hs[p:p+3]),
      |                             list_min(hs[p:p+3]))
      |       for p in range(1, len(hs) - 2)])) AS pos
      |  FROM g)
      |SELECT doc_id, pos::BIGINT AS pos, hs[pos] AS fp
      |FROM sel ORDER BY doc_id, pos""".stripMargin
  ) { (s, d) =>
    TextAnalysis.winnowFingerprints(Tables.documents(s, d))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Conditional bigram-LM NLL per doc in micro-nats (MLE rates; the
    * bigram analogue of p44, sharper on templated text). */
  val p69 = Q.sql(
    "p69_bigram_perplexity",
    """WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 2),
      |big AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |        FROM w, unnest(range(1, len(w))) t(i)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
      |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
      |nll AS (SELECT c2.w1, c2.w2,
      |          CAST(round(-ln(c2.c2 / c1.c1) * 1000000) AS BIGINT) AS nb
      |        FROM c2 JOIN c1 ON c2.w1 = c1.w1)
      |SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
      |  sum(nll.nb)::BIGINT AS nll_micro,
      |  (sum(nll.nb)::BIGINT // (count(*)::BIGINT * 1000000)) AS ppl_bucket
      |FROM big b JOIN nll ON b.w1 = nll.w1 AND b.w2 = nll.w2
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    Curation.bigramPerplexity(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Inverted-index build: term → df / tf / capped ascending posting
    * list (bounded native top-k state — no corpus-sized collect). */
  val p70 = Q.sql(
    "p70_inverted_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |cells AS (SELECT term, doc_id, count(*) AS tf_doc
      |          FROM toks GROUP BY term, doc_id)
      |SELECT term, count(*)::BIGINT AS df, sum(tf_doc)::BIGINT AS tf,
      |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      |FROM cells GROUP BY term ORDER BY term""".stripMargin,
    bench = true
  ) { (s, d) =>
    Search.invertedIndex(Tables.documents(s, d)).orderBy(col("term"))
  }

  /** CDC last-writer-wins snapshot over the event log: latest event per
    * user decides the row; 'error'-tombstoned users are deleted. */
  val p71 = Q.sql(
    "p71_cdc_snapshot",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |n AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id),
      |last AS (SELECT user_id, event_id, ts_us, event_type, value,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY ts_us DESC, event_id DESC) AS rn
      |         FROM e)
      |SELECT l.user_id, n.n_events::BIGINT AS n_events,
      |  l.event_id AS last_event_id, l.ts_us AS last_ts_us,
      |  l.event_type AS last_type,
      |  CAST(round(l.value * 100) AS BIGINT) AS last_value_cents
      |FROM last l JOIN n USING (user_id)
      |WHERE rn = 1 AND l.event_type <> 'error'
      |ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    graft.pipeline.Sessions.cdcSnapshot(Tables.events(s, d))
      .orderBy(col("user_id"))
  }

  /** Johnson–Lindenstrauss ±1 hash-sign projection 64→16 dims, exact
    * integer dot products over micro-quantized inputs. */
  val p72 = Q.sql(
    "p72_jl_projection",
    """WITH q AS (
      |  SELECT vec_id,
      |    [round(embedding[i+1]::DOUBLE * 1000000)::BIGINT
      |     for i in range(0, 64)] AS q
      |  FROM embeddings),
      |s AS (SELECT vec_id, j,
      |        list_sum([q[i+1] *
      |          (CASE WHEN ('0x' || substr(md5(i || ':' || j), 1, 2))::INT & 1 = 1
      |                THEN 1 ELSE -1 END)
      |          for i in range(0, 64)])::BIGINT AS proj_micro
      |      FROM q, unnest(range(0, 16)) t(j))
      |SELECT vec_id, j::BIGINT AS dim, proj_micro
      |FROM s ORDER BY vec_id, dim""".stripMargin
  ) { (s, d) =>
    Similarity.jlProject(Tables.embeddings(s, d))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** ANN recall audit: recall@10 of the IVF path vs exact brute-force
    * kNN per query — the embedding twin of p66. The oracle recomputes
    * BOTH sides (quadratic kNN + the full IVF assignment/search). */
  val p73 = Q.sql(
    "p73_ann_recall_audit",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, embedding AS qe, cell FROM asg
      |      WHERE vec_id < 10),
      |ap AS (
      |  SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.qe[i]::DOUBLE * a.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))) AS cos
      |  FROM q JOIN asg a ON q.cell = a.cell AND a.vec_id <> q.qid),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM ap) WHERE rank <= 10),
      |ep AS (
      |  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.qe[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
      |  FROM q, embeddings c WHERE q.qid <> c.vec_id),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM ep) WHERE rank <= 10)
      |SELECT e.query_id, count(*)::BIGINT AS n_exact,
      |  sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |    AS n_hit,
      |  sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |    * 1000 // count(*)::BIGINT AS recall_permille
      |FROM exact e LEFT JOIN approx a
      |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.annRecallAudit(e.filter(col("vec_id") < 10), e, 10)
      .orderBy(col("query_id"))
  }

  /** Winnowing-overlap near-dup pairs: ≥70% containment of the smaller
    * doc's fingerprint set — MOSS-style contained-passage detection. */
  val p74 = Q.sql(
    "p74_winnow_overlap_pairs",
    """WITH g AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(substring(lower(text), i, 5)), 1, 15))::BIGINT
      |     for i in range(1, length(text) - 3)] AS hs
      |  FROM documents WHERE length(text) >= 8),
      |sel AS (
      |  SELECT doc_id, hs,
      |    unnest(list_distinct(
      |      [p + 4 - list_position(list_reverse(hs[p:p+3]),
      |                             list_min(hs[p:p+3]))
      |       for p in range(1, len(hs) - 2)])) AS pos
      |  FROM g),
      |fps AS (SELECT DISTINCT doc_id, hs[pos] AS fp FROM sel),
      |sz AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
      |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.id_a, p.id_b, p.ns::BIGINT AS n_shared,
      |  (p.ns * 1000 // least(sa.n, sb.n))::BIGINT AS containment_permille
      |FROM pairs p JOIN sz sa ON p.id_a = sa.doc_id
      |  JOIN sz sb ON p.id_b = sb.doc_id
      |WHERE p.ns * 1000 // least(sa.n, sb.n) >= 700
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    TextAnalysis.winnowOverlapPairs(Tables.documents(s, d))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Zipf rank-frequency slope per source over the top-100 words —
    * integer-exact regression, one double division. */
  val p75 = Q.sql(
    "p75_zipf_slope",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
      |top AS (SELECT source, w, c,
      |          row_number() OVER (PARTITION BY source
      |                             ORDER BY c DESC, w) AS r
      |        FROM cnt QUALIFY r <= 100),
      |xy AS (SELECT source,
      |         CAST(round(ln(r) * 1000000) AS BIGINT) AS x,
      |         CAST(round(ln(c) * 1000000) AS BIGINT) AS y FROM top),
      |agg AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |          sum(x * y) AS sxy, sum(x * x) AS sxx
      |        FROM xy GROUP BY source)
      |SELECT source, n::BIGINT AS n_terms,
      |  CAST(round((n * sxy - sx * sy)::DOUBLE /
      |             (n * sxx - sx * sx)::DOUBLE * 1000000) AS BIGINT)
      |    AS slope_micro
      |FROM agg ORDER BY source""".stripMargin
  ) { (s, d) =>
    TextAnalysis.zipfSlope(Tables.documents(s, d)).orderBy(col("source"))
  }

  /** Per-source near-dup rate from the verified MinHash pair set;
    * zero-dup sources report 0. */
  val p76 = Q.sql(
    "p76_dup_rate_by_source",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b
      |  WHERE a.doc_id < b.doc_id
      |    AND len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      |m AS (SELECT id_a AS doc_id FROM pr UNION SELECT id_b FROM pr),
      |d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |md AS (SELECT d2.source, count(*) AS n_dup
      |       FROM m JOIN documents d2 ON m.doc_id = d2.doc_id
      |       GROUP BY d2.source)
      |SELECT d.source, d.n_docs::BIGINT AS n_docs,
      |  coalesce(md.n_dup, 0)::BIGINT AS n_dup_members,
      |  (coalesce(md.n_dup, 0) * 1000 // d.n_docs)::BIGINT AS dup_permille
      |FROM d LEFT JOIN md ON d.source = md.source
      |ORDER BY d.source""".stripMargin
  ) { (s, d) =>
    Clusters.dupRateBySource(Tables.documents(s, d)).orderBy(col("source"))
  }

  /** Product-quantization encode: 8 subspaces × 16 hash-ranked
    * centroids, integer micro² argmin — the 64×-compression ANN
    * memory trick, exact by construction. */
  val p77 = Q.sql(
    "p77_pq_encode",
    """WITH seeds AS (
      |  SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS k
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
      |          vec_id
      |        LIMIT 16)),
      |cb AS (
      |  SELECT k, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS c
      |  FROM seeds, unnest(range(0, 64)) t(i)),
      |q AS (
      |  SELECT vec_id, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings, unnest(range(0, 64)) t(i)),
      |dists AS (
      |  SELECT q.vec_id, q.i // 8 AS j, cb.k,
      |    sum((q.x - cb.c) * (q.x - cb.c)) AS d
      |  FROM q JOIN cb ON q.i = cb.i
      |  GROUP BY q.vec_id, q.i // 8, cb.k),
      |best AS (
      |  SELECT vec_id, j, k, d,
      |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      |  FROM dists)
      |SELECT vec_id, j::BIGINT AS subspace, k::BIGINT AS code,
      |  d::BIGINT AS sq_err
      |FROM best WHERE rn = 1
      |ORDER BY vec_id, subspace""".stripMargin
  ) { (s, d) =>
    Similarity.pqEncode(Tables.embeddings(s, d))
      .orderBy(col("vec_id"), col("subspace"))
  }

  /** PQ asymmetric-distance (ADC) top-10 per query over codebook
    * reconstructions — the IVFADC serving inner loop, integer-exact. */
  val p78 = Q.sql(
    "p78_pq_adc_search",
    """WITH seeds AS (
      |  SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS k
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
      |          vec_id
      |        LIMIT 16)),
      |cb AS (
      |  SELECT k, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS c
      |  FROM seeds, unnest(range(0, 64)) t(i)),
      |q AS (
      |  SELECT vec_id, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings, unnest(range(0, 64)) t(i)),
      |dists AS (
      |  SELECT q.vec_id, q.i // 8 AS j, cb.k,
      |    sum((q.x - cb.c) * (q.x - cb.c)) AS d
      |  FROM q JOIN cb ON q.i = cb.i
      |  GROUP BY q.vec_id, q.i // 8, cb.k),
      |codesw AS (
      |  SELECT vec_id, j, k AS code FROM (
      |    SELECT vec_id, j, k, d,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      |    FROM dists) WHERE rn = 1),
      |recon AS (
      |  SELECT cw.vec_id, cb.i, cb.c AS r
      |  FROM codesw cw JOIN cb ON cb.k = cw.code AND cb.i // 8 = cw.j),
      |qv AS (SELECT vec_id AS qid, i, x FROM q WHERE vec_id < 5),
      |ad AS (
      |  SELECT qv.qid, r.vec_id AS neighbor_id,
      |    sum((qv.x - r.r) * (qv.x - r.r)) AS dist
      |  FROM qv JOIN recon r ON qv.i = r.i AND r.vec_id <> qv.qid
      |  GROUP BY qv.qid, r.vec_id),
      |rk AS (
      |  SELECT qid AS query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY qid
      |                       ORDER BY dist, neighbor_id) AS rank
      |  FROM ad)
      |SELECT query_id, rank::BIGINT AS rank, neighbor_id,
      |  dist::BIGINT AS adc_dist
      |FROM rk WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.pqAdcSearch(e.filter(col("vec_id") < 5), e, 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVFADC: cell-confined ADC — the production ANN serving shape
    * (equi-join on the IVF cell, ranking over PQ reconstructions). The
    * oracle composes p12's assignment CTEs with p78's codebook CTEs. */
  val p79 = Q.sql(
    "p79_ivfadc_search",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |seeds AS (
      |  SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS k
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
      |          vec_id
      |        LIMIT 16)),
      |cb AS (
      |  SELECT k, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS c
      |  FROM seeds, unnest(range(0, 64)) t(i)),
      |q AS (
      |  SELECT vec_id, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings, unnest(range(0, 64)) t(i)),
      |dists AS (
      |  SELECT q.vec_id, q.i // 8 AS j, cb.k,
      |    sum((q.x - cb.c) * (q.x - cb.c)) AS d
      |  FROM q JOIN cb ON q.i = cb.i
      |  GROUP BY q.vec_id, q.i // 8, cb.k),
      |codesw AS (
      |  SELECT vec_id, j, k AS code FROM (
      |    SELECT vec_id, j, k, d,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      |    FROM dists) WHERE rn = 1),
      |recon AS (
      |  SELECT cw.vec_id, cb.i, cb.c AS r
      |  FROM codesw cw JOIN cb ON cb.k = cw.code AND cb.i // 8 = cw.j),
      |qv AS (
      |  SELECT a.vec_id AS qid, a.cell AS qcell, q.i, q.x
      |  FROM asg a JOIN q ON q.vec_id = a.vec_id
      |  WHERE a.vec_id < 5),
      |ad AS (
      |  SELECT qv.qid, r.vec_id AS neighbor_id,
      |    sum((qv.x - r.r) * (qv.x - r.r)) AS dist
      |  FROM qv JOIN recon r ON qv.i = r.i
      |    JOIN asg a2 ON a2.vec_id = r.vec_id
      |  WHERE a2.cell = qv.qcell AND r.vec_id <> qv.qid
      |  GROUP BY qv.qid, r.vec_id),
      |rk AS (
      |  SELECT qid AS query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY qid
      |                       ORDER BY dist, neighbor_id) AS rank
      |  FROM ad)
      |SELECT query_id, rank::BIGINT AS rank, neighbor_id,
      |  dist::BIGINT AS adc_dist
      |FROM rk WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.ivfAdcSearch(e.filter(col("vec_id") < 5), e, 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** REAL multimodal decode #1 — 24-bit BMP: per-doc images are genuine
    * BMP binaries (bottom-up rows, 4-byte padding, BGR) encoded AND
    * decoded executor-side through MediaCodec; the oracle recomputes the
    * per-channel pixel sums from the closed-form pixel function alone,
    * so a hash match proves the binary round trip is lossless. */
  val p86 = Q.sql(
    "p86_bmp_pixel_decode",
    """WITH d AS (SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      |           FROM documents),
      |px AS (SELECT doc_id, w, h, gx.x, gy.y
      |       FROM d, generate_series(0, 7) AS gx(x),
      |               generate_series(0, 5) AS gy(y)
      |       WHERE gx.x < w AND gy.y < h)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  sum((doc_id * 31 + x * 7 + y * 13) % 256)::BIGINT AS sum_r,
      |  sum((doc_id * 17 + x * 11 + y * 5) % 256)::BIGINT AS sum_g,
      |  sum((doc_id * 29 + x * 3 + y * 19) % 256)::BIGINT AS sum_b
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Multimodal.bmpPixelStats(
        Multimodal.bmpMediaTable(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** REAL multimodal decode #2 — PCM16 WAV: RIFF chunk walk, 16-bit LE
    * samples; decoded samples window into integer Σs² energies. */
  val p87 = Q.sql(
    "p87_wav_waveform_decode",
    """WITH d AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
      |s AS (SELECT doc_id, g.i,
      |        ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
      |      FROM d, generate_series(0, 95) AS g(i) WHERE g.i < n),
      |w AS (SELECT doc_id, i // 16 AS w, sum(v * v)::BIGINT AS energy
      |      FROM s GROUP BY doc_id, i // 16),
      |rk AS (SELECT doc_id, w, energy,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY energy DESC, w DESC) AS rn,
      |         count(*) OVER (PARTITION BY doc_id) AS nw
      |       FROM w)
      |SELECT doc_id, nw::BIGINT AS n_windows, energy::BIGINT AS peak_energy,
      |  w::BIGINT AS peak_w
      |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Multimodal.wavWaveformStats(
        Multimodal.wavMediaTable(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** REAL multimodal decode #3 — perceptual hash over decoded BMP pixels:
    * block-vs-global gray comparison by cross-multiplication, bit-exact
    * against the oracle's closed-form recomputation. */
  val p88 = Q.sql(
    "p88_bmp_phash_decode",
    """WITH d AS (SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      |           FROM documents),
      |px AS (SELECT doc_id, w * h AS n, (gy.y * w + gx.x) AS i,
      |         (doc_id * 31 + gx.x * 7 + gy.y * 13) % 256 +
      |         (doc_id * 17 + gx.x * 11 + gy.y * 5) % 256 +
      |         (doc_id * 29 + gx.x * 3 + gy.y * 19) % 256 AS gray
      |       FROM d, generate_series(0, 7) AS gx(x),
      |               generate_series(0, 5) AS gy(y)
      |       WHERE gx.x < w AND gy.y < h),
      |blk AS (SELECT doc_id, n, (i * 60) // n AS b,
      |          sum(gray)::BIGINT AS bsum, count(*)::BIGINT AS bn
      |        FROM px GROUP BY doc_id, n, (i * 60) // n),
      |tot AS (SELECT doc_id, sum(bsum)::BIGINT AS tsum FROM blk GROUP BY doc_id)
      |SELECT blk.doc_id,
      |  sum(CASE WHEN bsum * blk.n > tsum * bn
      |      THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)::BIGINT AS phash
      |FROM blk JOIN tot ON blk.doc_id = tot.doc_id
      |GROUP BY blk.doc_id ORDER BY blk.doc_id""".stripMargin
  ) { (s, d) =>
    Multimodal.bmpPhashDecoded(
        Multimodal.bmpMediaTable(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval: Reciprocal Rank Fusion of the BM25 keyword
    * ranking (p36's terms) with the exact-cosine ranking for query
    * vector 0 (doc_id ≡ vec_id). The oracle recomputes both branch
    * rankings and the 1/(60+rank) fusion independently; integer ranks
    * and fixed lex-then-sem addition order keep the fused double
    * bit-identical. */
  val p89 = Q.sql(
    "p89_rrf_hybrid_search",
    """WITH tf AS (
      |  SELECT doc_id, len(w) AS dl,
      |    len(list_filter(w, x -> x = 'dup')) AS tf0,
      |    len(list_filter(w, x -> x = 'vector')) AS tf1,
      |    len(list_filter(w, x -> x = 'stream')) AS tf2
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
      |stat AS (
      |  SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl,
      |    count(*) FILTER (tf0 > 0) AS df0,
      |    count(*) FILTER (tf1 > 0) AS df1,
      |    count(*) FILTER (tf2 > 0) AS df2
      |  FROM tf),
      |idf AS (
      |  SELECT n, avgdl,
      |    round(ln(1 + (n - df0 + 0.5) / (df0 + 0.5)), 6) AS idf0,
      |    round(ln(1 + (n - df1 + 0.5) / (df1 + 0.5)), 6) AS idf1,
      |    round(ln(1 + (n - df2 + 0.5) / (df2 + 0.5)), 6) AS idf2
      |  FROM stat),
      |lex0 AS (
      |  SELECT doc_id,
      |    round(idf0 * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |        + idf1 * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |        + idf2 * (tf2 * (1.2 + 1)) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
      |      4) AS score
      |  FROM tf, idf
      |  WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
      |  ORDER BY score DESC, doc_id LIMIT 50),
      |lex AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      |  FROM lex0),
      |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |p AS (
      |  SELECT c.vec_id AS doc_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
      |  FROM q, embeddings c WHERE c.vec_id <> 0),
      |sem AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
      |  FROM p ORDER BY cos DESC, doc_id LIMIT 50)
      |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
      |  coalesce(l.lex_rank, -1)::BIGINT AS lex_rank,
      |  coalesce(s.sem_rank, -1)::BIGINT AS sem_rank,
      |  round(coalesce(1.0 / (60 + l.lex_rank), 0)
      |      + coalesce(1.0 / (60 + s.sem_rank), 0), 6) AS rrf
      |FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  ) { (s, d) =>
    Search.rrfHybrid(Tables.documents(s, d), Tables.embeddings(s, d),
      Seq("dup", "vector", "stream"), queryVecId = 0L)
  }

  /** Overlap-coefficient (containment) near-dup pairs — inclusion
    * duplicates the symmetric Jaccard join under-scores. The oracle is
    * the all-pairs ground truth; a green hash proves the asymmetric
    * prefix filter (smaller side's prefix vs the other side's full
    * posting list) lost no pair. */
  val p90 = Q.sql(
    "p90_containment_neardup",
    """WITH gr AS (
      |  SELECT doc_id,
      |    list_distinct([substring(lower(text), i, 5)
      |                   for i in range(1, length(lower(text)) - 3)]) AS s
      |  FROM documents WHERE length(text) >= 5)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.s, b.s)) / least(len(a.s), len(b.s)) AS overlap
      |FROM gr a, gr b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.s, b.s)) / least(len(a.s), len(b.s)) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    Dedup.overlapNearDups(Tables.documents(s, d), threshold = 0.8, n = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Tokenizer fertility per language — integer sums + `div` ratios
    * only; the multilingual sequence-budget diagnostic. */
  val p91 = Q.sql(
    "p91_token_fertility",
    """WITH s AS (
      |  SELECT lang, count(*)::BIGINT AS n_docs,
      |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))::BIGINT AS tokens,
      |    sum(len(string_split_regex(text, '\s+')))::BIGINT AS words,
      |    sum(length(text))::BIGINT AS chars
      |  FROM documents GROUP BY lang)
      |SELECT lang, n_docs, tokens, words, chars,
      |  (1000 * tokens) // words AS tokens_per_mille_words,
      |  (100 * chars) // tokens AS chars_per_100_tokens
      |FROM s ORDER BY lang""".stripMargin
  ) { (s, d) =>
    TextAnalysis.tokenFertility(Tables.documents(s, d)).orderBy(col("lang"))
  }

  /** Per-document shingle novelty in corpus order (min-doc_id first
    * occurrence): the boilerplate/new-content curation signal. */
  val p92 = Q.sql(
    "p92_shingle_novelty",
    """WITH shx AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                          for i in range(1, len(w)-1)])) AS sh
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |f AS (SELECT sh, min(doc_id) AS first_id FROM shx GROUP BY sh),
      |agg AS (
      |  SELECT s.doc_id, count(*)::BIGINT AS total_shingles,
      |    sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END)::BIGINT
      |      AS novel_shingles
      |  FROM shx s JOIN f USING (sh) GROUP BY s.doc_id)
      |SELECT doc_id, total_shingles, novel_shingles,
      |  (10000 * novel_shingles) // total_shingles AS novelty_bp
      |FROM agg ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    TextAnalysis.shingleNovelty(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** Incremental dedup served from a PERSISTED band index: the standing
    * corpus's MinHash band signatures are materialized ONCE as a Graft
    * table partitioned by band_idx ([[graft.pipeline.Serving]]), and the
    * new batch (doc_id%10=7) probes them through the format library's
    * scan — no corpus rehash on the serving path. Result contract (and
    * oracle) identical to p53: the persisted-index path must reproduce
    * the recompute-everything path exactly. */
  val p93 = Q.sql(
    "p93_band_index_serving",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |m AS (
      |  SELECT n.doc_id AS new_id, count(*)::BIGINT AS n_dups,
      |    min(i.doc_id) AS first_match
      |  FROM sh n JOIN sh i
      |    ON n.doc_id % 10 = 7 AND i.doc_id % 10 <> 7
      |    AND len(list_intersect(n.s, i.s)) /
      |      (len(n.s) + len(i.s) - len(list_intersect(n.s, i.s))) >= 0.5
      |  GROUP BY n.doc_id)
      |SELECT d.doc_id AS new_id, coalesce(m.n_dups, 0)::BIGINT AS n_dups,
      |  m.first_match
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
      |LEFT JOIN m ON d.doc_id = m.new_id
      |ORDER BY new_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val index = docs.filter(col("doc_id") % 10 =!= 7)
    val (catalog, _) = Q.freshCatalog(s, "bidx")
    val t = Serving.persistBandIndex(index, "wband", catalog)
    Serving.dedupAgainstBandIndex(t, s, index,
        docs.filter(col("doc_id") % 10 === 7), threshold = 0.5)
      .orderBy(col("new_id"))
  }

  /** IVF ANN served from a PERSISTED index: the corpus's cell
    * assignments land in a Graft table partitioned by IDENTITY(cell)
    * and the quantizer in a sibling centroid table
    * ([[graft.pipeline.Serving.persistIvfIndex]]); the query batch then
    * reads ONLY its probed cells through the format library's pruned
    * scan. Oracle identical to p12 — the persisted path must reproduce
    * the recompute path exactly. */
  val p95 = Q.sql(
    "p95_ivf_index_serving",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, embedding AS qe, cell FROM asg WHERE vec_id < 10),
      |p AS (
      |  SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.qe[i]::DOUBLE * a.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))) AS cos
      |  FROM q JOIN asg a ON q.cell = a.cell AND a.vec_id <> q.qid),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM p)
      |SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos_sim
      |FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val (catalog, _) = Q.freshCatalog(s, "ivf")
    val (t, ct) = Serving.persistIvfIndex(e, "wivf", catalog)
    Serving.annFromIvfIndex(t, ct, s, e.filter(col("vec_id") < 10), 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF index MAINTENANCE: the quantizer freezes at build time over
    * the standing corpus (vec_id%3<>0); the ingested batch (vec_id%3=0)
    * is assigned to the EXISTING centroids and appended in one atomic
    * snapshot ([[graft.pipeline.Serving.ivfIndexBatch]]); the probe then
    * reads only its probed cells of the GROWN index. The oracle samples
    * the quantizer from the standing slice only — the maintenance
    * contract — then ranks over the full corpus. */
  val p97 = Q.sql(
    "p97_ivf_index_maintenance",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  WHERE vec_id % 3 <> 0
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, embedding, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, embedding AS qe, cell FROM asg WHERE vec_id < 10),
      |p AS (
      |  SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> q.qe[i]::DOUBLE * a.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))) AS cos
      |  FROM q JOIN asg a ON q.cell = a.cell AND a.vec_id <> q.qid),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM p)
      |SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos_sim
      |FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin,
    bench = true
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val (catalog, _) = Q.freshCatalog(s, "ivfm")
    val (t0, ct) = Serving.persistIvfIndex(
      e.filter(col("vec_id") % 3 =!= 0), "wivfm", catalog)
    val t = Serving.ivfIndexBatch(t0, ct, e.filter(col("vec_id") % 3 === 0))
    Serving.annFromIvfIndex(t, ct, s, e.filter(col("vec_id") < 10), 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact ingest dedup served from a PERSISTED membership filter: the
    * standing corpus (doc_id%10<>0) materializes keyed by md5(text) with
    * a per-key-bucket Bloom filter attached to its snapshot
    * ([[graft.pipeline.Membership]] — Puffin statistics file, the
    * reference's snapshot-addressed sketch slot), and the ingest batch
    * (doc_id%10=0 plus exact copies of corpus docs under shifted ids)
    * asks for its NEW keys: filter-rejected rows are definitely new and
    * never touch corpus data; candidates verify through the
    * bucket-pruned scan. The answer is EXACT — identical to the NOT IN
    * anti-join — which is what the oracle computes. */
  val p99 = Q.sql(
    "p99_membership_serving",
    """WITH corpus AS (
      |  SELECT md5(text) AS k FROM documents WHERE doc_id % 10 <> 0),
      |b AS (
      |  SELECT doc_id, md5(text) AS text_md5 FROM documents
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, md5(text) AS text_md5
      |  FROM documents WHERE doc_id % 100 = 7)
      |SELECT doc_id, text_md5 FROM b
      |WHERE text_md5 NOT IN (SELECT k FROM corpus)
      |ORDER BY doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    import graft.pipeline.Membership
    val docs = Tables.documents(s, d)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("text_md5"))
    val (catalog, _) = Q.freshCatalog(s, "memb")
    val t0 = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 =!= 0)), "wmemb", catalog, "text_md5")
    val t = Membership.writeMembershipFilter(t0, s, "text_md5")
    Membership.newKeys(t, s,
        keyed(docs.filter(col("doc_id") % 10 === 0))
          .unionAll(keyed(docs.filter(col("doc_id") % 100 === 7))
            .select((col("doc_id") + 2000000).as("doc_id"), col("text_md5"))),
        "text_md5")
      .orderBy(col("doc_id"))
  }

  /** IVFADC served from a PERSISTED index: the corpus lives as (vec_id,
    * cell, packed code_word) partitioned by identity(cell), with the
    * coarse quantizer and the PQ codebook as sibling tables
    * ([[graft.pipeline.Serving.persistIvfPqIndex]]); queries read ONLY
    * their probed cells' packed-code column, reconstruct against the
    * codebook literal, and rank by integer ADC. Oracle identical to p79 —
    * the persisted path must reproduce the recompute path exactly. */
  val p100 = Q.sql(
    "p100_ivfpq_index_serving",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |seeds AS (
      |  SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS k
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
      |          vec_id
      |        LIMIT 16)),
      |cb AS (
      |  SELECT k, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS c
      |  FROM seeds, unnest(range(0, 64)) t(i)),
      |q AS (
      |  SELECT vec_id, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings, unnest(range(0, 64)) t(i)),
      |dists AS (
      |  SELECT q.vec_id, q.i // 8 AS j, cb.k,
      |    sum((q.x - cb.c) * (q.x - cb.c)) AS d
      |  FROM q JOIN cb ON q.i = cb.i
      |  GROUP BY q.vec_id, q.i // 8, cb.k),
      |codesw AS (
      |  SELECT vec_id, j, k AS code FROM (
      |    SELECT vec_id, j, k, d,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      |    FROM dists) WHERE rn = 1),
      |recon AS (
      |  SELECT cw.vec_id, cb.i, cb.c AS r
      |  FROM codesw cw JOIN cb ON cb.k = cw.code AND cb.i // 8 = cw.j),
      |qv AS (
      |  SELECT a.vec_id AS qid, a.cell AS qcell, q.i, q.x
      |  FROM asg a JOIN q ON q.vec_id = a.vec_id
      |  WHERE a.vec_id < 5),
      |ad AS (
      |  SELECT qv.qid, r.vec_id AS neighbor_id,
      |    sum((qv.x - r.r) * (qv.x - r.r)) AS dist
      |  FROM qv JOIN recon r ON qv.i = r.i
      |    JOIN asg a2 ON a2.vec_id = r.vec_id
      |  WHERE a2.cell = qv.qcell AND r.vec_id <> qv.qid
      |  GROUP BY qv.qid, r.vec_id),
      |rk AS (
      |  SELECT qid AS query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY qid
      |                       ORDER BY dist, neighbor_id) AS rank
      |  FROM ad)
      |SELECT query_id, rank::BIGINT AS rank, neighbor_id,
      |  dist::BIGINT AS adc_dist
      |FROM rk WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val (catalog, _) = Q.freshCatalog(s, "ivfpq")
    val (t, ct, cbt) = Serving.persistIvfPqIndex(e, "wivfpq", catalog)
    Serving.annFromIvfPqIndex(t, ct, cbt, s, e.filter(col("vec_id") < 5), 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVFADC index MAINTENANCE: quantizer AND codebook freeze at build
    * time over the standing corpus (vec_id%3<>0); the ingested batch
    * (vec_id%3=0) assigns to the frozen quantizer, encodes against the
    * frozen codebook, and appends in one atomic snapshot
    * ([[graft.pipeline.Serving.ivfPqIndexBatch]]); the probe then ranks
    * over the GROWN index. The oracle samples quantizer and codebook
    * from the standing slice only — the maintenance contract — then
    * assigns, encodes, and ranks the full corpus. */
  val p101 = Q.sql(
    "p101_ivfpq_maintenance",
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
      |  WHERE vec_id % 3 <> 0
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
      |  LIMIT 64),
      |sc AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE)))) AS cs
      |  FROM embeddings e, cent c),
      |asg AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cs DESC, cid) AS rn FROM sc)
      |  WHERE rn = 1),
      |seeds AS (
      |  SELECT vec_id, embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS k
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        WHERE vec_id % 3 <> 0
      |        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
      |          vec_id
      |        LIMIT 16)),
      |cb AS (
      |  SELECT k, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS c
      |  FROM seeds, unnest(range(0, 64)) t(i)),
      |q AS (
      |  SELECT vec_id, i, round(embedding[i+1]::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings, unnest(range(0, 64)) t(i)),
      |dists AS (
      |  SELECT q.vec_id, q.i // 8 AS j, cb.k,
      |    sum((q.x - cb.c) * (q.x - cb.c)) AS d
      |  FROM q JOIN cb ON q.i = cb.i
      |  GROUP BY q.vec_id, q.i // 8, cb.k),
      |codesw AS (
      |  SELECT vec_id, j, k AS code FROM (
      |    SELECT vec_id, j, k, d,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      |    FROM dists) WHERE rn = 1),
      |recon AS (
      |  SELECT cw.vec_id, cb.i, cb.c AS r
      |  FROM codesw cw JOIN cb ON cb.k = cw.code AND cb.i // 8 = cw.j),
      |qv AS (
      |  SELECT a.vec_id AS qid, a.cell AS qcell, q.i, q.x
      |  FROM asg a JOIN q ON q.vec_id = a.vec_id
      |  WHERE a.vec_id < 5),
      |ad AS (
      |  SELECT qv.qid, r.vec_id AS neighbor_id,
      |    sum((qv.x - r.r) * (qv.x - r.r)) AS dist
      |  FROM qv JOIN recon r ON qv.i = r.i
      |    JOIN asg a2 ON a2.vec_id = r.vec_id
      |  WHERE a2.cell = qv.qcell AND r.vec_id <> qv.qid
      |  GROUP BY qv.qid, r.vec_id),
      |rk AS (
      |  SELECT qid AS query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY qid
      |                       ORDER BY dist, neighbor_id) AS rank
      |  FROM ad)
      |SELECT query_id, rank::BIGINT AS rank, neighbor_id,
      |  dist::BIGINT AS adc_dist
      |FROM rk WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin,
    bench = true
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val (catalog, _) = Q.freshCatalog(s, "ivfpqm")
    val (t0, ct, cbt) = Serving.persistIvfPqIndex(
      e.filter(col("vec_id") % 3 =!= 0), "wivfpqm", catalog)
    val t = Serving.ivfPqIndexBatch(t0, ct, cbt,
      e.filter(col("vec_id") % 3 === 0))
    Serving.annFromIvfPqIndex(t, ct, cbt, s, e.filter(col("vec_id") < 5), 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Incremental GROUP-BY aggregate maintenance (materialized view): the
    * standing corpus (doc_id%10<>0) lands in a source Graft table and its
    * per-(lang, source) count/Σn_chars aggregate persists as a
    * bucket(lang)-partitioned artifact ([[graft.pipeline.Serving
    * .persistGroupAgg]]); the ingested batch (doc_id%10=0) appends to the
    * SOURCE, and [[graft.pipeline.Serving.aggFold]] folds ONLY the
    * appended window — read via the format library's append-only
    * incremental scan — into the aggregate in one atomic upsert whose
    * summary carries the new source watermark. The oracle recomputes the
    * aggregate from scratch: fold ≡ rebuild, integer-exact. */
  val p103 = Q.sql(
    "p103_incremental_agg",
    """SELECT lang, source, count(*)::BIGINT AS cnt,
      |  sum(n_chars)::BIGINT AS total
      |FROM documents GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin,
    bench = true
  ) { (s, d) =>
    import graft.pipeline.Serving
    import graft.spec.{IcebergSchema, PartitionSpec}
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val (catalog, _) = Q.freshCatalog(s, "iagg")
    var src = graft.table.GraftTable.create("wsrcagg", catalog,
      IcebergSchema.fromSpark(docs.schema), PartitionSpec(0, Nil))
      .append(docs.filter(col("doc_id") % 10 =!= 0))
    val agg0 = Serving.persistGroupAgg(src, s, "waggt", catalog,
      Seq("lang", "source"), "n_chars")
    src = src.append(docs.filter(col("doc_id") % 10 === 0))
    val agg = Serving.aggFold(agg0, src, s, Seq("lang", "source"), "n_chars")
    agg.newScan().toDF(s).orderBy(col("lang"), col("source"))
  }

  val all: Seq[Q] = Seq(p01, p02, p03, p04, p05, p06, p07, p08, p09, p10,
    p11, p12, p13, p14, p15, p16, p17, p18, p19, p20, p21, p22, p23, p24,
    p25, p26, p27, p28, p29, p30, p31, p32, p33, p34, p35, p36, p37, p38,
    p39, p40, p41, p42, p43, p44, p45, p46, p47, p48, p49, p50, p51, p52,
    p53, p54, p55, p56, p57, p58, p59, p60, p61, p62, p63, p64, p65, p66,
    p67, p68, p69, p70, p71, p72, p73, p74, p75, p76, p77, p78, p79,
    p86, p87, p88, p89, p90, p91, p92, p93, p95, p97, p99, p100, p101,
    p103)
}
