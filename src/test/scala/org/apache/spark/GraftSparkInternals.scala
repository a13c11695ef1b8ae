package org.apache.spark

/** Test-only hook: SparkContext has `setCheckpointDir` but no public
  * unset, and the spec session is shared across suites — a spec that
  * exercises [[graft.Materialize.barrier]]'s reliable-checkpoint branch
  * must be able to restore the prior (unset) state afterwards so every
  * other suite keeps the local fallback it was measured with.
  */
object GraftSparkInternals {
  def setCheckpointDirRaw(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
