package graft.core

/** D4 retry-with-backoff (`retry.backoff.ms`,
  * `OSSSinkConnectorConfiguration.RETRY_BACKOFF_CONFIG`; failure handling
  * at `TopicPartitionWriter.java:158-171`): the reference buffers the
  * in-flight records, pauses the partitions, and retries the write after
  * the backoff. Here the same bounded retry runs in the executor around
  * each FILE write (the unit the reference retries); beyond
  * `attempts`, the exception propagates and Spark's own task retry
  * (`spark.task.maxFailures`) + query restart policy take over — the
  * platform layer the reference's Connect runtime redelivery maps to.
  */
object Retry {
  def withBackoff[T](attempts: Int, backoffMs: Long,
                     sleeper: Long => Unit = Thread.sleep)(body: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var n = 0
    while (true) {
      n += 1
      try return body
      catch {
        case _: java.io.IOException if n < attempts => sleeper(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
