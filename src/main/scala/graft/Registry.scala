package graft

import graft.queries._

/** Central registry of all operators exposed through SparkEntry.
  * Each module contributes a Seq[Q]; names must be globally unique.
  */
object Registry {
  def modules: Seq[Seq[Q]] = Seq(
    RelationalQueries.all,
    IcebergQueries.all,
    PipelineQueries.all,
    WritePathQueries.all,
    StreamingQueries.all,
    MaintenanceQueries.all
  )

  lazy val all: Seq[Q] = {
    val qs = modules.flatten
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  lazy val benchQueries: Seq[Q] = all.filter(_.bench)
}
