package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of the sink write-once latch: the winner runs the
  * write exactly once, losers BLOCK until it completes (never read a
  * half-written path), and a failed write releases the key for retry. */
class SinksSpec extends AnyFunSuite {

  test("once: concurrent callers block until the winner's write completes") {
    val key = s"sinks-spec-${System.nanoTime()}"
    val writes = new AtomicInteger(0)
    val writerEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val loserDone = new CountDownLatch(1)
    @volatile var loserSawCompletedWrite = false

    val winner = new Thread(() => Sinks.once(key) {
      writes.incrementAndGet()
      writerEntered.countDown()
      release.await() // hold the write open while the loser arrives
    })
    winner.start()
    assert(writerEntered.await(5, TimeUnit.SECONDS))

    val loser = new Thread(() => {
      Sinks.once(key) { writes.incrementAndGet() }
      // only reachable after the winner's write finished
      loserSawCompletedWrite = writes.get() == 1 && release.getCount == 0
      loserDone.countDown()
    })
    loser.start()
    // the loser must be parked while the write is in flight
    Thread.sleep(100)
    assert(loserDone.getCount == 1, "loser proceeded during an in-flight write")

    release.countDown()
    assert(loserDone.await(5, TimeUnit.SECONDS))
    winner.join(5000); loser.join(5000)
    assert(writes.get() == 1, "write ran more than once")
    assert(loserSawCompletedWrite, "loser resumed before the write completed")
  }

  test("once: a failed write un-marks the key so a retry actually writes") {
    val key = s"sinks-spec-fail-${System.nanoTime()}"
    val writes = new AtomicInteger(0)
    intercept[RuntimeException] {
      Sinks.once(key) { throw new RuntimeException("disk full") }
    }
    Sinks.once(key) { writes.incrementAndGet() }
    assert(writes.get() == 1)
  }
}
