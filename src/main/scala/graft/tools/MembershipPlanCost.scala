package graft.tools

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Measurement harness for the membership filter's literal-blob
  * plan-size boundary (VERDICT r12 item 3): [[graft.pipeline.Membership]]
  * ships per-bucket Bloom blobs as binary `Literal`s in a when-chain —
  * the codegen shape — but GB-scale literals living in the expression
  * tree cost plan serialization + per-task taskBinary deserialization
  * long before Spark's broadcast limit bites. This main prices both
  * sides at 1/8/64 MB per bucket × 4 touched buckets:
  *
  *   - `literal`: the production when-chain
  *     (BloomFilterMightContain over a binary Literal per bucket);
  *   - `broadcast`: the same verdicts from a
  *     `sparkContext.broadcast(blobs)` + a scala UDF that deserializes
  *     each bucket's filter once per executor (no blob in the plan).
  *
  * Per variant it reports plan construction+analysis seconds and the
  * end-to-end filter job seconds (median of 3 after one warm run) over
  * a 100k-row batch on 32 partitions. The measured boundary is cited at
  * `Membership.mightContainCol`.
  */
object MembershipPlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nBuckets = 4
    val rows = 100000L

    def blobOfBytes(targetBytes: Long, seedBase: Long): Array[Byte] = {
      // numBits = bytes * 8; BloomFilter sizes by (items, bits) — pick
      // items to keep ~half the bits set (realistic, incompressible-ish)
      val bits = targetBytes * 8
      val f = BloomFilter.create(math.max(1024, bits / 10), bits)
      var i = 0L
      val inserts = bits / 12 // ~dense fill without saturating
      while (i < inserts) { f.putLong(seedBase + i * 2654435761L); i += 1 }
      val out = new java.io.ByteArrayOutputStream()
      f.writeTo(out)
      out.toByteArray
    }

    /** Median of 3 after a warm run; -1 marks a hard failure (the 256 MB
      * literal case DIES in task deserialization — that boundary is the
      * result, not an error of this harness). */
    def med3(run: () => Double): Double =
      try {
        run() // warm
        (1 to 3).map(_ => run()).sorted.apply(1)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plancost] variant failed: ${e.getMessage}")
          -1.0
      }

    val batch = spark.range(rows).select(
      col("id"), concat(lit("key_"), col("id")).as("k"))
      .repartition(32).localCheckpoint()

    val results = Seq(1L, 8L, 64L).map { mb =>
      System.err.println(s"[plancost] building blobs mb=$mb")
      val bytesPer = mb * 1024 * 1024
      val blobs: Map[Int, Array[Byte]] =
        (0 until nBuckets).map(b => b -> blobOfBytes(bytesPer, b * 1000000L)).toMap
      System.err.println(s"[plancost] literal phase mb=$mb")

      // ---- literal when-chain (the production shape) ----
      def literalCol(): Column = {
        val bucket = pmod(xxhash64(col("k")), lit(nBuckets)).cast("int")
        val keyHash = xxhash64(col("k"))
        (0 until nBuckets).foldLeft(lit(false)) { (acc, b) =>
          val mc = GraftBridge.column(BloomFilterMightContain(
            Literal.create(blobs(b), BinaryType),
            GraftBridge.expression(keyHash)))
          when(bucket === lit(b), mc).otherwise(acc)
        }
      }
      val litPlanSec = med3 { () =>
        val t0 = System.nanoTime()
        batch.filter(literalCol()).queryExecution.executedPlan // analyze+plan
        (System.nanoTime() - t0) / 1e9
      }
      val litRunSec = med3 { () =>
        val t0 = System.nanoTime()
        batch.filter(literalCol()).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }

      // ---- broadcast variable + codegen expression (per-executor cache) ----
      System.err.println(s"[plancost] broadcast phase mb=$mb")
      val bc = spark.sparkContext.broadcast(blobs)
      val token = java.util.UUID.randomUUID().toString
      def broadcastCol(): Column =
        graft.functions.BloomBlobMightContainExpr.column(
          pmod(xxhash64(col("k")), lit(nBuckets)).cast("int"),
          xxhash64(col("k")), bc, token)
      val bcPlanSec = med3 { () =>
        val t0 = System.nanoTime()
        batch.filter(broadcastCol()).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      val bcRunSec = med3 { () =>
        val t0 = System.nanoTime()
        batch.filter(broadcastCol()).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      bc.destroy()
      f"""{"mb_per_bucket":$mb,"total_mb":${mb * nBuckets},""" +
        f""""literal_plan_sec":$litPlanSec%.3f,"literal_run_sec":$litRunSec%.3f,""" +
        f""""broadcast_plan_sec":$bcPlanSec%.3f,"broadcast_run_sec":$bcRunSec%.3f}"""
    }
    val json = results.mkString(
      s"""{"probe":"membership-plan-cost","buckets":$nBuckets,"rows":$rows,"sizes":[""",
      ",", "]}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_PLANCOST.json"), json + "\n")
    spark.stop()
    println(json)
  }
}

