package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec._

/** v3 row lineage on the NATIVE DSv2 path (metadata_columns.rs:63,66 —
  * reserved ids i32.MAX-107/-108): `_row_id` and
  * `_last_updated_sequence_number` must be SQL-queryable, equal the V1
  * scan path's values row-for-row, and survive compaction (the rewrite
  * materializes per-row lineage into its output files — first_row_id
  * inheritance cannot reconstruct ids across a shuffle). */
class RowLineageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    wh = java.nio.file.Files.createTempDirectory("graft-lineage").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))

  private def nativeLineage(name: String) =
    spark.read.format("graft").option("warehouse", wh).option("table", name)
      .load()
      .select(col("o_orderkey"), col("_row_id"),
        col("_last_updated_sequence_number").as("_seq"))

  private def v1Lineage(t: GraftTable) =
    t.newScan().withMetadataColumns().toDF(spark)
      .select(col("o_orderkey"), col("_row_id"),
        col("_last_updated_sequence_number").as("_seq"))

  /** key → (row_id, seq) map. */
  private def byKey(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("native path equals V1 path on a two-append table") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    val t = GraftTable.create("orders_lin", catalog, schema)
      .append(src.filter(col("o_orderkey") % 2 === 0))
      .append(src.filter(col("o_orderkey") % 2 === 1))

    val native = byKey(nativeLineage("orders_lin"))
    val v1 = byKey(v1Lineage(t))
    val n = src.count()
    assert(native.size == n)
    assert(native == v1, "native DSv2 lineage must equal the V1 scan path")
    // dense 0..N-1 across the two contiguous first_row_id blocks
    assert(native.values.map(_._1).toSeq.sorted == (0L until n).toSeq)
    // per-row last-updated = the append commit's sequence number
    val bySeq = native.groupBy(_._2._2).view.mapValues(_.size).toMap
    assert(bySeq(1L) == src.filter(col("o_orderkey") % 2 === 0).count())
    assert(bySeq(2L) == src.filter(col("o_orderkey") % 2 === 1).count())
  }

  test("compaction preserves lineage (materialized columns win)") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    val before = GraftTable.create("orders_lin_c", catalog, schema,
        properties = Map("write.spark.max-records-per-file" -> "300"))
      .append(src.filter(col("o_orderkey") % 2 === 0))
      .append(src.filter(col("o_orderkey") % 2 === 1))
    val pre = byKey(v1Lineage(before))

    val after = before.rewriteDataFiles(spark)
    assert(after.metadata.currentSnapshot.exists(_.operation == "replace"))
    // rewritten files carry MATERIALIZED lineage, not inherited blocks
    assert(after.newScan().planFiles().forall(_.file.firstRowId.isEmpty))

    val postNative = byKey(nativeLineage("orders_lin_c"))
    val postV1 = byKey(v1Lineage(after))
    assert(postNative == pre,
      "per-row (row_id, last_updated_seq) must survive compaction unchanged")
    assert(postV1 == pre, "V1 path must read materialized lineage too")

    // appends after compaction continue the id space densely: the replace
    // consumed no row-id block, so next-row-id is still N
    val extra = src.filter(col("o_orderkey") % 1000 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    val grown = after.append(extra)
    val ids = byKey(v1Lineage(grown)).values.map(_._1).toSeq.sorted
    assert(ids == (0L until (src.count() + extra.count())).toSeq)
  }

  test("CoW UPDATE retains _row_id, refreshes sequence; untouched rows keep both") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    val before = GraftTable.create("orders_lin_u", catalog, schema,
        properties = Map("write.spark.max-records-per-file" -> "400"))
      .append(src)
    val pre = byKey(v1Lineage(before))

    val after = before.updateWhere(
      graft.expr.Predicate.eqTo("o_orderstatus", "F"),
      Map("o_totalprice" -> (col("o_totalprice") * 0.5)), spark)
    val updSeq = after.metadata.currentSnapshot.get.sequenceNumber
    val post = byKey(v1Lineage(after))
    val postNative = byKey(nativeLineage("orders_lin_u"))
    assert(post == postNative)
    assert(post.keySet == pre.keySet)

    val fKeys = src.filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    post.foreach { case (k, (id, seq)) =>
      assert(id == pre(k)._1, s"row id of $k must survive the CoW update")
      if (fKeys(k)) assert(seq == updSeq, s"updated row $k must carry the new seq")
      else assert(seq == pre(k)._2, s"untouched row $k must keep its seq")
    }
  }

  test("CoW MERGE: matched keys keep ids with new seq, inserts mint fresh ids") {
    val ss = spark; import ss.implicits._
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val schema = IcebergSchema.fromSpark(src.schema)
    val before = GraftTable.create("orders_lin_m", catalog, schema,
        properties = Map("write.spark.max-records-per-file" -> "400"))
      .append(src)
    val pre = byKey(v1Lineage(before))
    val nextId = before.metadata.nextRowId

    val matchedKeys = src.select("o_orderkey").limit(50)
      .collect().map(_.getLong(0)).toSet
    val updates = src.filter(col("o_orderkey").isInCollection(matchedKeys))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = (1 to 7).map(x => (90000000L + x, 1L, 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val after = before.mergeInto(updates.unionByName(inserts), Seq("o_orderkey"))
    val mergeSeq = after.metadata.currentSnapshot.get.sequenceNumber
    val post = byKey(v1Lineage(after))
    assert(post == byKey(nativeLineage("orders_lin_m")))

    post.foreach { case (k, (id, seq)) =>
      if (k >= 90000000L) {
        assert(id >= nextId, s"inserted row $k must mint a fresh id")
        assert(seq == mergeSeq)
      } else {
        assert(id == pre(k)._1, s"row id of $k must survive the merge")
        if (matchedKeys(k)) assert(seq == mergeSeq, s"matched $k gets new seq")
        else assert(seq == pre(k)._2, s"unmatched $k keeps its seq")
      }
    }
    // ids stay globally unique
    assert(post.values.map(_._1).toSeq.distinct.size == post.size)
  }

  test("zorder rewrite preserves lineage") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val schema = IcebergSchema.fromSpark(src.schema)
    val before = GraftTable.create("orders_lin_z", catalog, schema,
        properties = Map("write.spark.max-records-per-file" -> "300"))
      .append(src)
    val pre = byKey(v1Lineage(before))
    val after = before.rewriteDataFilesZOrder(spark,
      Seq("o_custkey", "o_totalprice"))
    assert(byKey(v1Lineage(after)) == pre)
    assert(byKey(nativeLineage("orders_lin_z")) == pre)
  }
}
