package graft.operators

import org.apache.spark.sql.SparkSession

/** Executor-heap-aware default for the size-gated-broadcast knobs.
  *
  * The tf-idf scorer broadcasts its attach frame when a one-job size
  * probe fits under a byte gate (the SNM verifier's gate defaults to
  * OFF instead — shuffle-hash won every measured size there, so its
  * broadcast is explicit opt-in and this heuristic only serves
  * call sites that turn it on without sizing it). The gate's
  * envelope measures the frame's DATA (64 B/row + per-term/shingle
  * bytes), but what an executor actually holds is several times that:
  * the deserialized hash relation (UnsafeRow copies + index) for EACH
  * of the two probes, resident simultaneously, plus task scratch.
  * Measured in real executor JVMs (ClusterSmoke, sf4's ~0.5 GB-envelope
  * vector frame): 16 g heap runs the broadcast path comfortably, 10 g
  * dies with a plain `java.lang.OutOfMemoryError: Java heap space` in
  * the scoring stage, 6 g dies faster. A fixed 1 GiB default is
  * therefore correct only for ≥ 16 g executors — on smaller ones the
  * gate must shrink so the shuffle fallback (correct at any heap,
  * disk-bounded) takes over.
  *
  * Default: min(1 GiB, executorHeap / 24) — 16 g → 683 MB (broadcasts
  * the measured frame, as the 16 g ladder always did), 10 g → 427 MB
  * (falls back, avoiding the measured OOM), 6 g → 256 MB (falls back).
  * An explicit `spark.graft.*.maxBroadcastBytes` overrides the
  * heuristic entirely — the operator owner knows their executors.
  * Heap source: `spark.executor.memory` when set (bare numbers are
  * MiB, per Spark's convention for this conf); otherwise this JVM's
  * max heap (local mode, where the executor IS the driver).
  */
object MemGate {

  /** Spark memory-conf string → bytes. Bare digits mean MiB
    * (spark.executor.memory's unit convention); suffixed forms go
    * through Spark's own parser ("4g", "512m", "1t"). */
  def parseMemoryString(s: String): Long = {
    val t = s.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong << 20
    else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(t)
  }

  def executorHeapBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.executor.memory")
      .map(parseMemoryString)
      .getOrElse(Runtime.getRuntime.maxMemory)

  def defaultMaxBroadcastBytes(heapBytes: Long): Long =
    math.min(1L << 30, heapBytes / 24)

  def defaultMaxBroadcastBytes(spark: SparkSession): Long =
    defaultMaxBroadcastBytes(executorHeapBytes(spark))

  /** Resolve a gate conf: explicit value wins verbatim (validated as a
    * byte count), absent falls to the heap-aware default. */
  def gateBytes(spark: SparkSession, key: String): Long =
    gateBytes(spark, key, defaultMaxBroadcastBytes(spark))

  /** Same resolution with a caller-chosen default — the SNM verifier
    * gates at 0 (broadcast is opt-in there: shuffle-hash won every
    * measured size), while the tf-idf scorer defaults to the
    * heap-aware heuristic. One parse-validate path for both. */
  def gateBytes(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key) match {
      case Some(raw) =>
        try raw.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be a byte count, got '$raw'")
        }
      case None => default
    }
}
