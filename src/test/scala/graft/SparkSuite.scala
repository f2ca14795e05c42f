package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + helpers for all suites (one JVM-wide session). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Stop a ProcessingTime-triggered query without interrupting a
    * mid-commit micro-batch: `stop()` interrupts the stream thread, and an
    * interrupt landing inside a state-store commit logs a
    * CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT ERROR (benign but noisy).
    * Waiting for the trigger gap first keeps test logs ERROR-free.
    * (`processAllAvailable` is not usable here — it need not terminate
    * once processing-time timeouts are registered.)
    */
  def stopQuiesced(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (q.status.isTriggerActive && System.nanoTime() < deadline) Thread.sleep(10)
    q.stop()
  }

  /** Run `body` with the RocksDB state store provider (required by the
    * transformWithState operators), restoring the previous provider after.
    */
  def withRocksDBState[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object SparkSuite {
  lazy val session: SparkSession = Sessions.local("4", "graft-test")
}
