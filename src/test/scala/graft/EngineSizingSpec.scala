package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sized-deployment knobs (Engine.sizedShufflePartitions /
  * sizedBroadcastThreshold) — the two numbers that move with data and
  * executor scale. Each clamp edge is load-bearing: the floor keeps small
  * corpora at thread-count parallelism (records unchanged), the caps stop
  * a huge corpus or heap from over-provisioning, and the mid-range slopes
  * are what the SF10/SF30 scale points measured (BASELINE.md). */
class EngineSizingSpec extends AnyFunSuite {

  private val MB = 1024L * 1024L

  test("broadcast threshold floors at Spark's 10 MB default") {
    // a 1 g heap must not shrink the stock threshold
    assert(Engine.sizedBroadcastThreshold(1024 * MB) == 10 * MB)
  }

  test("broadcast threshold scales as heap/128 in the mid-range") {
    assert(Engine.sizedBroadcastThreshold(16 * 1024 * MB) == 128 * MB)
    assert(Engine.sizedBroadcastThreshold(8 * 1024 * MB) == 64 * MB)
  }

  test("broadcast threshold caps at 256 MB however large the heap") {
    // beyond the cap the build side is genuinely fact-sized for any JVM
    assert(Engine.sizedBroadcastThreshold(64 * 1024 * MB) == 256 * MB)
    assert(Engine.sizedBroadcastThreshold(Long.MaxValue / 2) == 256 * MB)
  }

  test("shuffle partitions floor at the thread count on small corpora") {
    // the shipped sf0.001 corpus is far under 32×8 MB
    assert(Engine.sizedShufflePartitions("/root/testdata/sf0.001", 32) == 32)
  }

  test("shuffle partitions grow with corpus bytes and cap at 1024") {
    // a missing dir sizes as zero bytes → the floor
    assert(Engine.sizedShufflePartitions("/nonexistent", 32) == 32)
    // the cap is reachable only through byData, never the floor
    assert(Engine.sizedShufflePartitions("/nonexistent", 2048) == 2048)
  }
}
