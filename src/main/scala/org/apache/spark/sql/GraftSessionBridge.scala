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

  /** Bridge to `private[sql]` `internalCreateDataFrame(..., isStreaming)`:
    * a V1 streaming `Source.getBatch` must return a df whose plan IS
    * streaming (MicroBatchExecution asserts it); this wraps an arbitrary
    * computed InternalRow RDD as that streaming batch — the same call the
    * built-in V1 sources make. */
  /** Bridge to `private[sql]` `Dataset.ofRows`: rebind a logical plan to
    * a conf-carrying session clone so one write/scan executes under that
    * clone's conf without mutating the caller's session. */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  def internalCreateStreamingDataFrame(s: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
