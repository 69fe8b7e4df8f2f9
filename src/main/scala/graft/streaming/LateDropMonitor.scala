package graft.streaming

import java.util.UUID

import scala.collection.immutable.SortedMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Observability for the late-DROP side of every watermark contract.
  *
  * A watermark buys bounded state by discarding events older than the
  * late-arrival horizon — correct per contract, but invisible in
  * production unless the drop count is surfaced: the ×160 streaming
  * ladder's disordered replay silently discarded 25 % of input
  * (dedup_watermark at sf1), which an operator must be able to SEE
  * before deciding the horizon is too tight. Spark already counts the
  * discards — every stateful operator increments
  * `numRowsDroppedByWatermark` when it filters input older than the
  * previous batch's watermark — so observability is surfacing that
  * counter per batch, not re-deriving it: a `df.observe` aggregation
  * upstream of the stateful operator cannot know the watermark and
  * would double-count redeliveries.
  *
  * Usage: register once per session
  * (`spark.streams.addListener(listener)`), read per query id. The
  * listener is additive-only and thread-safe (progress events arrive
  * on the listener bus thread); retried batches overwrite their own
  * slot rather than double-counting. StreamLadder records the same
  * counter per (operator, SF) as `late_dropped` in
  * STREAMING_RAW.jsonl.
  */
final class LateDropListener extends StreamingQueryListener {

  private val drops =
    scala.collection.concurrent.TrieMap.empty[(UUID, Long), Long]
  // Rolled-up totals of terminated runs: per-batch rows are evicted on
  // termination (one TrieMap entry per batch would otherwise grow the
  // driver without bound — ~31 M entries/year at 1 s triggers), but
  // the lifetime discard count stays queryable. A restart that
  // REPLAYS a batch re-performs its drops, so the replayed batch
  // counts again here — this is drops-performed, not distinct-rows.
  private val terminatedTotals =
    scala.collection.concurrent.TrieMap.empty[UUID, Long]

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    // Sum across stateful operators: a multi-operator query (windowed
    // agg downstream of dedup) late-drops at each watermark gate.
    val n = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
    drops.put((p.id, p.batchId), n)
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val id = event.id
    val keys = drops.keySet.filter(_._1 == id)
    val runTotal = keys.iterator.flatMap(drops.get).sum
    if (runTotal != 0 || keys.nonEmpty)
      terminatedTotals.updateWith(id) {
        case Some(prev) => Some(prev + runTotal)
        case None => Some(runTotal)
      }
    keys.foreach(drops.remove)
  }

  /** batchId → rows dropped as late in that batch, for the query's
    * CURRENT run (per-batch detail is evicted when a run terminates;
    * use [[totalDropped]] for the lifetime count). */
  def perBatch(queryId: UUID): SortedMap[Long, Long] =
    SortedMap.from(drops.collect {
      case ((id, batch), n) if id == queryId => batch -> n
    })

  /** Total rows the watermark contract discarded over the query's
    * lifetime (as far as this listener observed it): terminated runs'
    * rolled-up totals plus the current run's per-batch counts. */
  def totalDropped(queryId: UUID): Long =
    terminatedTotals.getOrElse(queryId, 0L) + perBatch(queryId).values.sum
}
