package org.apache.spark.sql

/** Bridge to the `private[sql]` `cloneSession()`: graft builds its scan
  * DataFrames against a conf-carrying session clone (see
  * graft.SessionConf) instead of mutating the caller's session. The
  * method is stable public bytecode (DataFrameReader, streaming and
  * thread-local session inheritance all use it); only its Scala access
  * modifier hides it, hence this in-package accessor.
  */
object GraftSessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
