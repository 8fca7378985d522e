package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.model.AuditOffset

/** Offset audit trail (SURVEY §2.5 R2; reference:
  * `interceptors/FailProofInterceptor.java:21-44` mirrors consumed offsets to
  * an `audit-offsets` topic). Structured Streaming already checkpoints
  * offsets transactionally; this listener reproduces the *audit* side:
  * every micro-batch's per-source end offsets are captured as
  * [[AuditOffset]] rows which a caller can drain to any sink.
  */
final class AuditListener(appId: String) extends StreamingQueryListener {
  private val buffer = new ConcurrentLinkedQueue[AuditOffset]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.sources.foreach { s =>
      buffer.add(AuditOffset(appId, s.description, p.batchId, String.valueOf(s.endOffset)))
    }
  }

  /** Drain captured audit rows (e.g. into a DataFrame for an audit sink). */
  def drain(): Seq[AuditOffset] = {
    val out = Vector.newBuilder[AuditOffset]
    var v = buffer.poll()
    while (v != null) { out += v; v = buffer.poll() }
    out.result()
  }

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
}
