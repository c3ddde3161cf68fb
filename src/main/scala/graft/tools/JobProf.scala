package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch per-JOB profiler (optimization-round instrumentation; not part
  * of the driver contract): runs one registered query N times and prints
  * every Spark job's wall time, task count, Σtask-run and the callsite
  * (the first non-Spark frame of the job's submission stack), so a
  * query's wall clock decomposes into its constituent actions — the
  * between-jobs gap is driver-side work (planning, commits, FS metadata).
  *
  * Usage: runMain graft.tools.JobProf <queryName> [sfDir] [reps]
  */
object JobProf {
  private final case class JobRow(id: Int, t0: Long, var t1: Long = 0L,
    var tasks: Int = 0, var taskRunMs: Long = 0L, desc: String = "",
    site: String = "")

  /** 25 ms stack sampler over executor task threads (and optionally the
    * driver main thread): prints the hottest collapsed 3-frame signatures
    * at exit — enough to attribute IO-wait-heavy tasks to a subsystem. */
  private final class Sampler extends Thread("jobprof-sampler") {
    setDaemon(true)
    private val counts = new ConcurrentHashMap[String, java.lang.Long]()
    @volatile var halted = false
    override def run(): Unit = while (!halted) {
      val all = Thread.getAllStackTraces
      all.forEach { (t, st) =>
        if (t.getName == "main" && st.nonEmpty &&
            t.getState == Thread.State.RUNNABLE) {
          val names = st.iterator
            .map(f => s"${f.getClassName}.${f.getMethodName}").toSeq
          // top frame + the first frames that identify the SUBSYSTEM
          // (hadoop-fs / spark / graft) so fork/IO costs attribute
          val callers = names.filter(n => n.startsWith("org.apache.hadoop.fs") ||
            n.startsWith("org.apache.spark.sql.execution") ||
            n.startsWith("graft.")).take(4)
          val frames = (names.take(2) ++ callers).distinct.mkString(" <- ")
          counts.merge("DRIVER " + frames, 1L, (a, b) => a + b)
        }
        if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
          // topmost interesting frame + 2 callers, skipping pure JDK frames
          val interesting = st.iterator.filterNot { f =>
            val c = f.getClassName
            c.startsWith("java.") || c.startsWith("jdk.") || c.startsWith("sun.")
          }.toSeq
          // deep stacks for the two hot signatures under investigation
          val deep = interesting.headOption.exists { f =>
            f.getClassName.contains("WritableUtils") ||
              f.getClassName.contains("Shell") ||
              f.getClassName.endsWith("Configuration")
          }
          val frames = interesting.take(if (deep) 12 else 3)
            .map(f => s"${f.getClassName}.${f.getMethodName}").mkString(" <- ")
          val key = if (frames.isEmpty) st.head.toString else frames
          counts.merge(key, 1L, (a, b) => a + b)
        }
      }
      Thread.sleep(25)
    }
    def report(n: Int): Unit = {
      import scala.jdk.CollectionConverters._
      println("== sampler: hottest executor frames ==")
      counts.asScala.toSeq.sortBy(-_._2).take(n).foreach { case (k, v) =>
        println(f"  $v%6d  $k")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new ConcurrentHashMap[Int, JobRow]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, JobRow(e.jobId, System.nanoTime(), desc = desc, site = site))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.t1 = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute stages to the live job window they ended inside
        val now = System.nanoTime()
        val it = jobs.values().iterator()
        var best: JobRow = null
        while (it.hasNext) {
          val r = it.next()
          if (r.t0 <= now && (r.t1 == 0L || r.t1 >= now) && (best == null || r.t0 > best.t0))
            best = r
        }
        if (best != null) {
          best.tasks += e.stageInfo.numTasks
          best.taskRunMs += e.stageInfo.taskMetrics.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val sampler = new Sampler; sampler.start()

    val fn = graft.SparkEntry.queries(name)
    (0 until reps).foreach { rep =>
      jobs.clear(); order.clear()
      val w0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      org.apache.spark.GraftListenerBridge.flushListenerBus(spark.sparkContext)
      println(f"== $name rep $rep wall $wall%.3f s ==")
      var prevEnd = w0
      var jobSum = 0.0
      val ids = new java.util.ArrayList(order)
      ids.forEach { id =>
        val r = jobs.get(id)
        val gap = (r.t0 - prevEnd) / 1e9
        val dur = (r.t1 - r.t0) / 1e9
        jobSum += dur
        if (gap > 0.005 || dur > 0.005)
          println(f"  gap ${gap}%6.3f | job ${r.id}%3d ${dur}%7.3f s tasks ${r.tasks}%4d " +
            f"run ${r.taskRunMs / 1e3}%7.2f s  ${r.site}%-40s ${r.desc}")
        prevEnd = math.max(prevEnd, r.t1)
      }
      println(f"  jobs total $jobSum%.3f s; wall-jobs (driver-side) ${wall - jobSum}%.3f s; njobs ${ids.size()}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.queries.Q.dropTempWarehouses()
    }
    sampler.halted = true
    sampler.report(25)
    spark.stop()
  }
}
