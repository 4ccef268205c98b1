package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

import scala.concurrent.duration._

/** Restart supervisor ≅ reference `KafkaFlow.retryOnError`
  * (core/.../KafkaFlow.scala:36-43): when the streaming query fails, start
  * it again from its checkpoint with exponential backoff and jitter,
  * resetting the backoff after a healthy-run window. Spark's checkpoint
  * makes every restart resume exactly where the failed attempt committed
  * (state + offsets are atomic per microbatch), so the supervisor only has
  * to decide WHEN to restart — never what to replay.
  *
  * Defaults mirror the reference's strategy: 100 ms initial backoff,
  * doubling to a 1 min cap, reset after 5 min of uninterrupted run.
  */
object QuerySupervisor {

  final case class RetryConfig(
      minBackoff: FiniteDuration = 100.millis,
      maxBackoff: FiniteDuration = 1.minute,
      resetAfter: FiniteDuration = 5.minutes,
      maxRestarts: Int = Int.MaxValue,
      jitter: Double = 0.1)

  /** Start `startQuery` and supervise it on the calling thread: await
    * termination; on failure sleep the (jittered, capped) backoff and start
    * again. Returns the total number of restarts once the query stops
    * cleanly (`StreamingQuery.stop()`); rethrows the last failure when
    * `maxRestarts` is exhausted. A run longer than `resetAfter` resets the
    * backoff sequence (transient-failure bursts don't permanently degrade
    * the restart latency). */
  def superviseBlocking(
      startQuery: () => StreamingQuery,
      config: RetryConfig = RetryConfig(),
      rng: scala.util.Random = new scala.util.Random()): Int = {
    var attempt = 0
    var restarts = 0
    while (true) {
      val startedAt = System.nanoTime()
      val query = startQuery()
      try {
        query.awaitTermination()
        return restarts // clean stop
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          val ranFor = (System.nanoTime() - startedAt).nanos
          attempt = if (ranFor >= config.resetAfter) 1 else attempt + 1
          if (restarts >= config.maxRestarts) throw e
          restarts += 1
          val base = config.minBackoff.toMillis * math.pow(2.0, (attempt - 1).toDouble)
          val capped = math.min(base, config.maxBackoff.toMillis.toDouble)
          val jittered = capped * (1.0 + config.jitter * (2 * rng.nextDouble() - 1))
          Thread.sleep(math.max(0L, jittered.toLong))
      }
    }
    restarts // unreachable
  }
}
