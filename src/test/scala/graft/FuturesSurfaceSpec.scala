package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.concurrent.{Await, Future, ExecutionContext}

/** The `distributed.Client` futures surface (SURVEY §1.1: submit / map /
  * gather / as_completed) mapped onto Spark's concurrency model — the one
  * taught Dask concept with no query-registry analog, demonstrated and
  * pinned here instead (it is an execution-API surface, not a relational
  * operator, so there is nothing for a DuckDB oracle to check).
  *
  * The mapping, concretely:
  *  - `client.submit(f, x)` → run an action on another thread
  *    (`Future { df.collect() }`): a SparkSession is thread-safe for job
  *    submission and the scheduler interleaves the jobs.
  *  - `client.map` / `gather` → `Future.sequence` over a list of such
  *    submissions; results arrive as each job finishes.
  *  - `future.cancel()` → `RDD.collectAsync()` returns a `FutureAction`
  *    whose `cancel()` aborts the running job (Dask's
  *    `Client.cancel`); the action then fails with a SparkException
  *    rather than blocking forever.
  *  - Dask's per-client priorities → `sc.setLocalProperty(
  *    "spark.scheduler.pool", ...)`: the pool name is a THREAD-local
  *    property picked up by the FAIR scheduler (production sets
  *    `spark.scheduler.mode=FAIR`; under the test JVM's default FIFO the
  *    property attaches identically but jobs run in submission order —
  *    asserting fairness ratios would test the host's thread timing, not
  *    our code, so this pins the API contract instead).
  *
  * Scale note: none of this moves data to the driver beyond each action's
  * own result; concurrent submission matters at 100 TB because it keeps a
  * 1000-executor cluster busy while a small reduction trails — exactly
  * why Dask teaches futures next to dataframes.
  */
class FuturesSurfaceSpec extends SparkSuite {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("submit/map/gather: concurrent actions == sequential results") {
    val names = Seq("q01_flagship_agg", "q22_window_topk_per_group",
      "q41_array_funcs", "q160_group_mode_entropy")
    val sequential = names.map(n =>
      SparkEntry.queries(n)(spark, sfDir).collect().toSeq)
    val gathered = Await.result(
      Future.sequence(names.map(n => Future {
        SparkEntry.queries(n)(spark, sfDir).collect().toSeq
      })), 120.seconds)
    names.indices.foreach { i =>
      assert(gathered(i) == sequential(i),
        s"${names(i)} differed between concurrent and sequential run")
    }
  }

  test("as_completed: results usable as each job finishes, not in batch") {
    val done = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val fs = (0 until 3).map { i =>
      Future {
        val n = spark.range(1000L * (i + 1)).selectExpr("sum(id) AS s")
          .collect()(0).getLong(0)
        done.add(i)
        n
      }
    }
    val out = Await.result(Future.sequence(fs), 60.seconds)
    assert(out == (0 until 3).map(i => { val m = 1000L * (i + 1); m * (m - 1) / 2 }))
    assert(done.size == 3)
  }

  test("collectAsync returns a cancellable FutureAction") {
    // A deliberately slow job: 4 partitions sleeping 10 s each would take
    // ~10 s wall on the 4-core test master — cancel() must abort it fast
    // and surface as a failed action, like Dask future.cancel().
    val slow = spark.sparkContext.parallelize(1 to 4, 4)
      .mapPartitions { it => Thread.sleep(10000); it }
    val fa = slow.collectAsync()
    // Let tasks actually launch before cancelling.
    Thread.sleep(500)
    val t0 = System.nanoTime()
    fa.cancel()
    intercept[SparkException] {
      Await.result(fa, 30.seconds)
    }
    val cancelledIn = (System.nanoTime() - t0) / 1e9
    assert(cancelledIn < 8.0, s"cancel took ${cancelledIn}s — job ran to completion?")
    // And the non-cancelled path completes with the right answer.
    val ok = spark.sparkContext.parallelize(1 to 100, 4).map(_ * 2).collectAsync()
    assert(Await.result(ok, 60.seconds).sum == 10100)
  }

  test("scheduler pool is a thread-local property (FAIR scheduler contract)") {
    val sc = spark.sparkContext
    val fromOtherThread = Await.result(Future {
      sc.setLocalProperty("spark.scheduler.pool", "analytics")
      val seen = sc.getLocalProperty("spark.scheduler.pool")
      // jobs submitted from this thread now carry the pool tag
      val n = spark.range(100).count()
      sc.setLocalProperty("spark.scheduler.pool", null)
      (seen, n)
    }, 60.seconds)
    assert(fromOtherThread == (("analytics", 100L)))
    // the main thread's property is untouched — per-thread isolation
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
  }
}
