package graft.streaming

/**
 * Wall-clock accumulator for the HARNESS portion of the streaming gate
 * queries — source staging (temp-dir creation, store copies, parquet
 * rewrites of the input) and teardown (temp-tree deletes). The
 * streaming gates run these inside their query closures, so a bench
 * that times the closure end-to-end charges the stream key for work a
 * deployed pipeline never repeats per batch. The gate queries wrap
 * exactly those regions in [[setup]]; [[graft.Bench]] drains the
 * accumulator per key and reports `setup_sec` separately so the
 * headline stream number is steady-state processing (stream start +
 * per-batch plans + sink commit), where a real regression would live.
 *
 * Single global accumulator: the gate queries run one-at-a-time on the
 * bench/verify driver thread, and foreachBatch bodies never call
 * [[setup]] — contention is not a concern, but the counter is atomic
 * so a stray concurrent use cannot corrupt it.
 */
object StreamMeter {
  private val accNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `body`, charging its wall time to the harness bucket. */
  def setup[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally accNanos.addAndGet(System.nanoTime() - t0)
  }

  /** Harness seconds accumulated since the last drain; resets to zero. */
  def drainSec(): Double = accNanos.getAndSet(0L) / 1e9
}
