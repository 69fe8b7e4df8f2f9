package graft.operators

import graft.SparkSpec

/** Pins the executor-heap-aware broadcast-gate defaults (MemGate) —
  * the measured lesson from running the tf-idf scorer in real executor
  * JVMs: a frame whose DATA envelope passed the fixed 1 GiB gate
  * OOM'd 10 g executors once deserialized into two resident hash
  * relations. The division constant (24) encodes the measured floor:
  * 16 g broadcasts the sf4 frame (as every 16 g ladder run did),
  * 10 g and below fall back to the shuffle path. */
class MemGateSpec extends SparkSpec {

  test("memory strings: bare digits are MiB, suffixed forms are Spark's") {
    assert(MemGate.parseMemoryString("6144") === 6144L << 20)
    assert(MemGate.parseMemoryString("4g") === 4L << 30)
    assert(MemGate.parseMemoryString("512m") === 512L << 20)
    assert(MemGate.parseMemoryString(" 10240 ") === 10240L << 20)
  }

  test("default gate: heap/24 capped at 1 GiB") {
    // spark.executor.memory is a STATIC conf (set at session build —
    // ClusterSmoke derives it from the local-cluster spec), so the
    // pure function is pinned on parsed strings directly. The measured
    // ladder outcomes this constant must reproduce:
    def gateAt(mem: String): Long =
      MemGate.defaultMaxBroadcastBytes(MemGate.parseMemoryString(mem))
    assert(gateAt("16g") === (16L << 30) / 24)  // 683 MB: broadcasts sf4's ~0.5 GB frame
    assert(gateAt("10240") < (500L << 20))      // 427 MB: the 10 g OOM falls back
    assert(gateAt("6144") === (6144L << 20) / 24)
    // Huge executors stay capped — past 1 GiB the broadcast itself
    // (driver collect + per-executor resident copy) is the cost.
    assert(gateAt("100g") === 1L << 30)
  }

  test("explicit conf overrides verbatim; garbage fails loudly with the key") {
    val key = "spark.graft.test.maxBroadcastBytes"
    try {
      spark.conf.set(key, "12345")
      assert(MemGate.gateBytes(spark, key) === 12345L)
      spark.conf.set(key, "lots")
      val e = intercept[IllegalArgumentException](MemGate.gateBytes(spark, key))
      assert(e.getMessage.contains(key) && e.getMessage.contains("lots"))
    } finally spark.conf.unset(key)
  }

  test("without spark.executor.memory the local JVM's heap stands in") {
    assert(MemGate.executorHeapBytes(spark) === Runtime.getRuntime.maxMemory)
  }
}
