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
}

object SparkSuite {
  lazy val session: SparkSession = Sessions.local("4", "graft-test")
}
