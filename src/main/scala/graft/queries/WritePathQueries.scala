package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.IcebergSchema
import graft.table.{GraftTable, Maintenance}

/** Write/maintenance-path operators as BENCHED queries (VERDICT r3 item
  * 9): each invocation builds a FRESH table and times the full write path
  * — create + append + row-level op + read-back — so commit-path
  * regressions show up in BENCH round-over-round, not just read scans.
  * Fixtures are deliberately NOT cached (the write IS the benchmark);
  * results are deterministic aggregates of the final table state, so the
  * DuckDB oracle hash-checks the write's row-level correctness too. */
object WritePathQueries {

  private def fresh(spark: SparkSession, tag: String): (HadoopCatalog, String) =
    Q.freshCatalog(spark, tag)

  /** Point the ONE bench SQL catalog (`wbench`) at this invocation's
    * fresh warehouse and return its name. Spark's CatalogManager caches
    * plugin instances BY NAME for the session lifetime, and the default
    * GraftCatalogPlugin shape binds its warehouse at initialize —
    * reusing one name across invocations (the pre-r11 shape) left every
    * invocation after the first issuing its SQL against the FIRST
    * invocation's warehouse: the row-level op ran against a stale table
    * (an idempotent no-match no-op) while the read-back scanned the
    * fresh, un-mutated one. r11 fixed that with a unique catalog name
    * per invocation, which was correct but leaked two session-conf
    * entries plus a CatalogManager-cached plugin instance bound to an
    * already-deleted warehouse per invocation — unbounded session-state
    * growth across long bench loops (r11 ADVICE item 4). Now ONE name is
    * registered once in `warehouse-conf` mode: the cached plugin
    * re-reads `spark.graft.bench.warehouse` per operation and swaps its
    * backend when the value moves — constant session state, fresh
    * warehouse semantics. */
  private val WarehouseKey = "spark.graft.bench.warehouse"
  private def sqlCatalog(spark: SparkSession, wh: String): String = {
    val name = "wbench"
    // registration confs are set only once (CatalogManager ignores them
    // after the plugin instance is cached anyway); only the warehouse
    // key moves per invocation. SERIAL-ONLY by design: one shared key
    // means two write-path queries planned concurrently in one session
    // would alias each other's warehouse — Bench/Verify run queries
    // strictly sequentially, and no test invokes these concurrently.
    // Concurrent multi-warehouse work belongs in separately named
    // catalogs (the plugin supports any number).
    if (spark.conf.getOption(s"spark.sql.catalog.$name").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalogPlugin")
      spark.conf.set(s"spark.sql.catalog.$name.warehouse-conf", WarehouseKey)
    }
    spark.conf.set(WarehouseKey, wh)
    name
  }

  /** Copy-on-write DELETE: non-translatable predicate forces the
    * group-based ReplaceData rewrite over every matching file. l_quantity
    * holds small integral values, so the double sum is order-exact. */
  val w01 = Q.sql(
    "w01_cow_delete",
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(l_quantity) AS BIGINT) AS qty,
      |  CAST(sum(l_orderkey) AS BIGINT) AS keysum
      |FROM lineitem WHERE l_orderkey % 7 <> 0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    bench = true
  ) { (s, d) =>
    val (catalog, wh) = fresh(s, "cow")
    val src = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    var t = GraftTable.create("wcow", catalog, IcebergSchema.fromSpark(src.schema))
    t = t.append(src.repartition(8))
    val cat = sqlCatalog(s, wh)
    s.sql(s"DELETE FROM $cat.wcow WHERE l_orderkey % 7 = 0")
    GraftTable.load("wcow", catalog).newScan().toDF(s)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("qty"),
        sum(col("l_orderkey")).cast("long").as("keysum"))
      .orderBy(col("l_returnflag"))
  }

  /** Merge-on-read MERGE: position-delta write (no data-file rewrite),
    * then the read-back applies the deltas — timing covers the delta
    * write AND the MoR read. Updates an int column for exactness. */
  val w02 = Q.sql(
    "w02_mor_merge",
    """SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
      |               ELSE o_custkey END) AS BIGINT) AS custsum,
      |  CAST(sum(o_orderkey) AS BIGINT) AS keysum
      |FROM orders""".stripMargin,
    bench = true
  ) { (s, d) =>
    val (catalog, wh) = fresh(s, "mor")
    val src = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    var t = GraftTable.create("wmor", catalog, IcebergSchema.fromSpark(src.schema),
      properties = Map("write.merge.mode" -> "merge-on-read"))
    t = t.append(src.repartition(8))
    val cat = sqlCatalog(s, wh)
    s.sql(s"""MERGE INTO $cat.wmor t
            |USING (SELECT o_orderkey AS k FROM $cat.wmor WHERE o_orderkey % 10 = 0) src
            |ON t.o_orderkey = src.k
            |WHEN MATCHED THEN UPDATE SET o_custkey = t.o_custkey + 1000000""".stripMargin)
    GraftTable.load("wmor", catalog).newScan().toDF(s)
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).cast("long").as("custsum"),
        sum(col("o_orderkey")).cast("long").as("keysum"))
  }

  /** Z-order compaction: rewrite the whole table into Morton-ordered
    * files, then a 2-D box scan over the result — times the rewrite
    * commit plus the post-rewrite pruned read (i28 reads a cached
    * fixture; this one PAYS the rewrite every run). */
  val w03 = Q.sql(
    "w03_zorder_rewrite",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity <= 5 AND l_extendedprice <= 20000
      |ORDER BY 1, 2, 3, 4""".stripMargin,
    bench = true
  ) { (s, d) =>
    import graft.expr.{And => PAnd, BinaryPred, LtEq}
    val (catalog, _) = fresh(s, "zo")
    val src = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    var t = GraftTable.create("wzo", catalog, IcebergSchema.fromSpark(src.schema))
    t = t.append(src.repartition(8))
    t = Maintenance.rewriteDataFilesZOrder(t, s,
      Seq("l_quantity", "l_extendedprice"), targetFileSizeBytes = 4L << 20)
    t.newScan()
      .withFilter(graft.expr.Predicate.bind(
        PAnd(BinaryPred(LtEq, "l_quantity", 5.0),
          BinaryPred(LtEq, "l_extendedprice", 20000.0)), t.schema))
      .toDF(s)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
  }

  /** Position-delete compaction: two MoR DELETE commits stack two delete
    * file sets; rewritePositionDeletes folds them into one compacted,
    * (file,pos)-sorted set and the MoR read-back must be unchanged —
    * times the delta writes, the compaction (read + broadcast semi-join
    * + range-sorted write + manifest tombstoning) and the final read. */
  val w04 = Q.sql(
    "w04_posdelete_rewrite",
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS keysum
      |FROM orders
      |WHERE o_orderkey % 5 <> 0 AND o_custkey % 7 <> 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    bench = true
  ) { (s, d) =>
    val (catalog, wh) = fresh(s, "pdr")
    val src = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus")
    var t = GraftTable.create("wpdr", catalog, IcebergSchema.fromSpark(src.schema),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t = t.append(src.repartition(8))
    val cat = sqlCatalog(s, wh)
    s.sql(s"DELETE FROM $cat.wpdr WHERE o_orderkey % 5 = 0")
    s.sql(s"DELETE FROM $cat.wpdr WHERE o_custkey % 7 = 0")
    t = GraftTable.load("wpdr", catalog).rewritePositionDeletes(s)
    t.newScan().toDF(s)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("keysum"))
      .orderBy(col("o_orderstatus"))
  }

  /** The pipeline→format-library loop closed: quality-aware dedup
    * (canonical per duplicate cluster) MATERIALIZED into a fresh Graft
    * table, then answered from the TABLE's scan — proving the curated
    * corpus a pipeline produces round-trips through the write path
    * byte-exactly. The oracle recomputes the dedup decision (recursive-
    * CTE connected components + ranked canonical, the p65 contract) from
    * raw parquet. */
  val w05 = Q.sql(
    "w05_dedup_writeback",
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
      |  SELECT c.doc_id,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |                       ORDER BY sc.score_micro DESC, c.doc_id) AS rn
      |  FROM comp c JOIN sc ON c.doc_id = sc.doc_id),
      |keep AS (
      |  SELECT doc_id FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM comp)
      |  UNION ALL SELECT doc_id FROM r WHERE rn = 1)
      |SELECT d.source, count(*)::BIGINT AS n_docs,
      |  CAST(sum(d.n_chars) AS BIGINT) AS chars
      |FROM documents d JOIN keep k ON d.doc_id = k.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin
  ) { (s, d) =>
    val (catalog, _) = fresh(s, "dwb")
    val docs = Tables.documents(s, d)
    val cc = graft.pipeline.Clusters.canonicalByQuality(docs, threshold = 0.5)
    val keepIds = cc.filter(col("canonical")).select("doc_id")
      .unionAll(docs.select("doc_id")
        .join(cc.select("doc_id"), Seq("doc_id"), "left_anti"))
    val deduped = docs.join(keepIds, Seq("doc_id"))
    var t = GraftTable.create("wdwb", catalog,
      IcebergSchema.fromSpark(deduped.schema))
    t = t.append(deduped)
    t.newScan().toDF(s)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"))
      .orderBy(col("source"))
  }

  /** Atomic upsert (eq-delete + append in ONE snapshot), checked at BOTH
    * MoR stages: `mor` reads through the live equality delete, `folded`
    * reads after rewriteDataFiles compacted the delete away — both must
    * agree with the oracle's replace-then-union semantics. The upsert
    * batch replaces every o_orderkey % 10 = 0 row (custkey + 1000000) and
    * inserts fresh rows under shifted keys (no key collision). */
  val w06 = Q.sql(
    "w06_upsert_fold",
    """WITH ups AS (
      |  SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_orderstatus
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |final AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |  WHERE o_orderkey % 10 <> 0
      |  UNION ALL SELECT * FROM ups)
      |SELECT s.stage, f.o_orderstatus, count(*)::BIGINT AS n,
      |  CAST(sum(f.o_custkey) AS BIGINT) AS custsum,
      |  CAST(sum(f.o_orderkey) AS BIGINT) AS keysum
      |FROM (VALUES ('folded'), ('mor')) s(stage), final f
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val (catalog, _) = fresh(s, "ups")
    val src = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus")
    var t = GraftTable.create("wups", catalog, IcebergSchema.fromSpark(src.schema))
    t = t.append(src.repartition(8))
    val batch = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_custkey", col("o_custkey") + 1000000)
      .unionAll(src.filter(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + 100000000).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus")))
    t = t.upsert(batch, Seq("o_orderkey"))
    def agg(tt: GraftTable, stage: String) = tt.newScan().toDF(s)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).cast("long").as("custsum"),
        sum(col("o_orderkey")).cast("long").as("keysum"))
      .withColumn("stage", lit(stage))
    val mor = agg(t, "mor")
    val folded = agg(t.rewriteDataFiles(s), "folded")
    folded.unionAll(mor)
      .select(col("stage"), col("o_orderstatus"), col("n"),
        col("custsum"), col("keysum"))
      .orderBy(col("stage"), col("o_orderstatus"))
  }

  /** Persisted-index SERVING: the inverted index materialized as a Graft
    * table partitioned by bucket(term, 16)
    * ([[graft.pipeline.Serving.persistInvertedIndex]]), then a probe-term
    * retrieval answered from the table's scan with the In-predicate
    * pushed through the bucket transform — manifest-level pruning, the
    * serving analogue of the reference's TableProvider role. The oracle
    * recomputes the index rows for the probe terms from raw parquet. */
  val w07 = Q.sql(
    "w07_index_serving",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |cells AS (SELECT term, doc_id, count(*) AS tf_doc
      |          FROM toks GROUP BY term, doc_id)
      |SELECT term, count(*)::BIGINT AS df, sum(tf_doc)::BIGINT AS tf,
      |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      |FROM cells
      |WHERE term IN ('the', 'data', 'model', 'learning', 'quick', 'zebra')
      |GROUP BY term ORDER BY term""".stripMargin,
    bench = true
  ) { (s, d) =>
    val (catalog, _) = fresh(s, "idx")
    val t = graft.pipeline.Serving.persistInvertedIndex(
      Tables.documents(s, d), "winv", catalog)
    graft.pipeline.Serving.lookupTerms(t, s,
        Seq("the", "data", "model", "learning", "quick", "zebra"))
      .orderBy(col("term"))
  }

  /** Inverted-index MAINTENANCE: the standing corpus (doc_id%10<>7)
    * persists once, the ingested batch (doc_id%10=7) folds in through
    * ONE atomic equality-delete + append upsert touching only the
    * batch's terms ([[graft.pipeline.Serving.indexDocsBatch]] — exact
    * merge, no corpus re-read), and the probe then reads the MoR scan.
    * Oracle identical to w07 (a rebuild over the full corpus): the
    * folded artifact must be indistinguishable from rebuilding. */
  val w08 = Q.sql(
    "w08_index_maintenance",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |cells AS (SELECT term, doc_id, count(*) AS tf_doc
      |          FROM toks GROUP BY term, doc_id)
      |SELECT term, count(*)::BIGINT AS df, sum(tf_doc)::BIGINT AS tf,
      |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      |FROM cells
      |WHERE term IN ('the', 'data', 'model', 'learning', 'quick', 'zebra')
      |GROUP BY term ORDER BY term""".stripMargin,
    bench = true
  ) { (s, d) =>
    val (catalog, _) = fresh(s, "idxm")
    val docs = Tables.documents(s, d)
    var t = graft.pipeline.Serving.persistInvertedIndex(
      docs.filter(col("doc_id") % 10 =!= 7), "winvm", catalog)
    t = graft.pipeline.Serving.indexDocsBatch(t,
      docs.filter(col("doc_id") % 10 === 7))
    graft.pipeline.Serving.lookupTerms(t, s,
        Seq("the", "data", "model", "learning", "quick", "zebra"))
      .orderBy(col("term"))
  }

  /** Membership-filter MAINTENANCE: the standing corpus (doc_id%10 not in
    * {0,5}) persists keyed by md5(text) with a per-bucket Bloom filter
    * attached to its snapshot as a Puffin statistics file; the ingested
    * batch (doc_id%10=5) folds in through ONE atomic append+filter commit
    * ([[graft.pipeline.Membership.membershipIndexBatch]]); the probe
    * batch (doc_id%10=0, plus exact copies of the FOLDED docs under
    * shifted ids) then asks for its new keys. The copies pin fold
    * exactness end-to-end: a fold that lost bits would report them
    * definitely-new (bloom false negatives are impossible) and break the
    * hash. Oracle = the exact NOT IN over the post-fold corpus. */
  val w09 = Q.sql(
    "w09_membership_fold",
    """WITH corpus AS (
      |  SELECT md5(text) AS k FROM documents WHERE doc_id % 10 <> 0),
      |b AS (
      |  SELECT doc_id, md5(text) AS text_md5 FROM documents
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 3000000 AS doc_id, md5(text) AS text_md5
      |  FROM documents WHERE doc_id % 10 = 5)
      |SELECT doc_id, text_md5 FROM b
      |WHERE text_md5 NOT IN (SELECT k FROM corpus)
      |ORDER BY doc_id""".stripMargin,
    bench = true
  ) { (s, d) =>
    import graft.pipeline.Membership
    val (catalog, _) = fresh(s, "memf")
    val docs = Tables.documents(s, d)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("text_md5"))
    var t = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)),
      "wmem", catalog, "text_md5")
    t = Membership.writeMembershipFilter(t, s, "text_md5")
    t = Membership.membershipIndexBatch(t,
      keyed(docs.filter(col("doc_id") % 10 === 5)), "text_md5")
    Membership.newKeys(t, s,
        keyed(docs.filter(col("doc_id") % 10 === 0))
          .unionAll(keyed(docs.filter(col("doc_id") % 10 === 5))
            .select((col("doc_id") + 3000000).as("doc_id"), col("text_md5"))),
        "text_md5")
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(w01, w02, w03, w04, w05, w06, w07, w08, w09)
}
