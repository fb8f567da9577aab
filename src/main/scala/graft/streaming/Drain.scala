package graft.streaming

import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** One-shot stream execution for the registered streaming queries:
  * `Trigger.AvailableNow` + `awaitTermination` instead of the test-utility
  * `processAllAvailable` + `stop` handshake. AvailableNow processes every
  * file already present (still honoring `maxFilesPerTrigger`, so
  * multi-batch state handoff is exercised exactly as before, including
  * the final watermark-advancing batch that flushes timed-out state) and
  * then TERMINATES ITSELF — the query's lifetime is data-paced, with no
  * idle trigger polling between "all data processed" and the caller's
  * stop() for host load to stretch (round-14 driver bench:
  * stream_file_source 4.4× its floor purely under loadavg 11). This is
  * also the production shape for incremental ingest: a cron-launched run
  * drains what arrived and exits, instead of parking a forever-running
  * query per table. */
object Drain {
  def availableNow[T](w: DataStreamWriter[T]): Unit = {
    val q = w.trigger(Trigger.AvailableNow()).start()
    // stop() in finally is a no-op on clean self-termination; it only
    // fires to tear down a query whose awaitTermination threw
    try q.awaitTermination() finally q.stop()
  }
}
