package graft.sources

import java.util.concurrent.TimeUnit

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Scaffold for the reference's push-style ingestion sources — sources where
  * an external party *pushes* events at the engine (HTTP POST bodies,
  * subprocess stdout lines, websocket frames, MQTT messages;
  * sources.py:273-388, 798-932) rather than the engine pulling from a
  * replayable log.
  *
  * Architecture (the same one Spark's own socket source uses): a feeder
  * thread on the DRIVER appends events to an in-memory buffer; each
  * micro-batch takes the buffered range [start, end) and ships the rows
  * inside the InputPartitions themselves, so executors never contact the
  * external endpoint. `commit(end)` trims everything below the committed
  * offset.
  *
  * Scale + delivery contract, stated honestly: a push endpoint is an
  * INGESTION EDGE, exactly like the reference's single-process tornado
  * loop — one listener, not a distributed scan. Throughput is bounded by
  * the driver's network stack, and events buffered but not yet committed
  * are lost on driver restart (at-most-once across failures; within a run,
  * offsets make each event appear in exactly one micro-batch). The 100 TB
  * path is push → Kafka → [[graft.streaming.Sources.kafka]]; these sources
  * exist for the reference's low-volume entry points (webhooks, process
  * output, device telemetry) where that tradeoff is the point.
  */
object PushSource {
  /** Every push source emits (value STRING, ts TIMESTAMP): the raw event
    * payload plus its driver-side arrival time (micros), ready for
    * `withWatermark("ts", ...)`.
    */
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))
}

/** Event-count offset (monotone; event i lives at offset i since stream start). */
case class PushOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

/** A micro-batch's slice of buffered (payload, arrivalMicros) rows. The rows
  * travel WITH the partition descriptor from driver to executor — there is
  * no external system to re-read them from.
  */
case class PushInputPartition(rows: Array[(String, Long)]) extends InputPartition

class PushPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[PushInputPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](UTF8String.fromString(rows(i)._1), java.lang.Long.valueOf(rows(i)._2)))
      override def close(): Unit = ()
    }
}

/** Driver-side buffered micro-batch stream; subclasses implement only the
  * feeder lifecycle and call [[push]] per event.
  */
abstract class PushMicroBatchStream(numPartitions: Int)
    extends MicroBatchStream with Logging {
  require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")

  // Buffer state guards on its own lock so that stop() — which joins
  // feeder threads — never holds the monitor a feeder's push() needs
  // (joining under a shared lock stalled shutdown by the full join
  // timeout whenever a message was in flight).
  private val bufLock = new Object
  private val buf = ArrayBuffer.empty[(String, Long)]
  private var base = 0L // global offset of buf(0)
  private var feederUp = false

  /** Start ingesting; invoke the callback once per arriving event. */
  protected def startFeeder(): Unit
  protected def stopFeeder(): Unit

  /** Append one event (thread-safe; called from feeder threads). */
  protected final def push(value: String): Unit = {
    val nowMicros = TimeUnit.MILLISECONDS.toMicros(System.currentTimeMillis())
    bufLock.synchronized { buf += ((value, nowMicros)) }
  }

  private def ensureStarted(): Unit = synchronized {
    if (!feederUp) { startFeeder(); feederUp = true }
  }

  override def initialOffset(): Offset = { ensureStarted(); PushOffset(0L) }
  override def latestOffset(): Offset = {
    ensureStarted()
    bufLock.synchronized { PushOffset(base + buf.size) }
  }

  /** Deserialization is also the recovery entry point: a checkpointed
    * offset beyond this (fresh) driver's range means the buffering
    * process died — REBASE so post-restart arrivals continue numbering
    * from the checkpoint instead of colliding with already-committed
    * offsets (which silently discarded every new event buffered before
    * the first post-restart commit). Pre-crash uncommitted events are
    * gone either way: the documented at-most-once window.
    */
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    bufLock.synchronized {
      if (n > base + buf.size) {
        logWarning(s"push source: recovered offset $n is beyond this driver's " +
          s"buffer [${base}, ${base + buf.size}); rebasing — events buffered " +
          "by the previous driver but not committed are lost (at-most-once)")
        base = n
      }
    }
    PushOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    bufLock.synchronized {
      val s = start.asInstanceOf[PushOffset].n
      val e = end.asInstanceOf[PushOffset].n
      // Long arithmetic clamped BEFORE narrowing (a >2^31-event range must
      // not wrap); out-of-buffer ranges emit what exists and warn
      val from = math.min(math.max(s - base, 0L), buf.size.toLong).toInt
      val until = math.min(math.max(e - base, 0L), buf.size.toLong).toInt
      if (s < base)
        logWarning(s"push source: offsets [$s, ${math.min(e, base)}) predate " +
          "this driver's buffer (restart?); those events are lost (at-most-once)")
      val slice = buf.slice(from, until).toArray
      if (slice.isEmpty) Array(PushInputPartition(Array.empty))
      else slice.grouped(math.max(1, math.ceil(slice.length.toDouble / numPartitions).toInt))
        .map(PushInputPartition(_): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new PushPartitionReaderFactory

  override def commit(end: Offset): Unit = bufLock.synchronized {
    val e = end.asInstanceOf[PushOffset].n
    val drop = math.min(math.max(e - base, 0L), buf.size.toLong).toInt
    buf.remove(0, drop)
    base = math.max(base, e)
  }

  override def stop(): Unit = synchronized {
    if (feederUp) { stopFeeder(); feederUp = false }
  }
}

/** TableProvider plumbing shared by all push sources: fixed schema,
  * micro-batch-only capability, one [[PushMicroBatchStream]] per started
  * query. Register by class name:
  * `spark.readStream.format(classOf[HttpSourceProvider].getName)`.
  */
abstract class PushTableProvider extends TableProvider {
  protected def sourceName: String
  protected def buildStream(options: CaseInsensitiveStringMap): PushMicroBatchStream

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PushSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new Table with SupportsRead {
    override def name(): String = sourceName
    override def schema(): StructType = PushSource.Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = PushSource.Schema
          override def description(): String = sourceName
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            buildStream(options)
        }
      }
  }
}
