package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Consumer side of the LSH bucket kernels' truncation telemetry: every
  * [[Dedup]] bucket aggregation `observe`s `graft_lsh_buckets_<n>`
  * metrics (over_cap_buckets / max_bucket_rows / buckets), but an
  * `observe` nobody listens to is a dashboard nobody built — this
  * listener captures them per completed query so a pipeline can ALERT
  * on silent recall loss (an over-cap bucket means candidate pairs were
  * deterministically dropped; the fix is boilerplate removal or a
  * bigger `maxBucket`, but only if someone finds out).
  *
  * Register once per session; snapshots are cumulative until
  * [[LshBucketMetrics.clear]]. Listener callbacks are asynchronous
  * (Spark dispatches QueryExecutionListener events on the listener
  * bus), so test/poll accordingly.
  */
final class LshBucketMetrics extends QueryExecutionListener {

  private val captured =
    new java.util.concurrent.ConcurrentLinkedQueue[LshBucketMetrics.Stats]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith("graft_lsh_buckets_")) {
        def long(field: String): Long =
          Option(row.getAs[Any](field)).fold(0L)(_.asInstanceOf[Long])
        captured.add(LshBucketMetrics.Stats(name,
          overCapBuckets = long("over_cap_buckets"),
          maxBucketRows = long("max_bucket_rows"),
          buckets = long("buckets")))
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()

  /** All bucket stats captured so far (one entry per bucket kernel per
    * completed query). */
  def snapshot: Seq[LshBucketMetrics.Stats] = captured.asScala.toSeq

  def clear(): Unit = captured.clear()
}

object LshBucketMetrics {
  case class Stats(metricName: String, overCapBuckets: Long,
      maxBucketRows: Long, buckets: Long)

  /** Register a fresh listener on the session and return it. */
  def install(spark: SparkSession): LshBucketMetrics = {
    val l = new LshBucketMetrics
    spark.listenerManager.register(l)
    l
  }
}
