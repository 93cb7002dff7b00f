package org.apache.spark

/** Test-only access to `private[spark]` context state. */
object GraftSparkTestHooks {

  /** Reset the context's checkpoint dir (a `private[spark] var` with no
    * public unset) so a suite can exercise reliable-checkpoint code paths
    * without leaking the setting into every other suite sharing the
    * JVM-wide SparkContext. */
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None

  /** Drain the listener bus so listener-based counters are stable before
    * a test asserts on them. */
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
