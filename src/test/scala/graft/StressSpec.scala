package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** The reference's targeted-stress workload, minus the sort file (ported in
  * [[SortSpillSpec]]):
  *
  *  - `stress.test` — the query mix itself: STRESS-Q1
  *    `select count(*) from (select * from lineitem limit 10) p`, run
  *    repeatedly/concurrently by the harness
  *    (`testdata/workloads/targeted-stress/queries/stress.test`).
  *  - `stress-with-invalidate-refresh.test` — the same mix interleaved with
  *    `INVALIDATE METADATA`, `INVALIDATE METADATA lineitem` and
  *    `REFRESH lineitem`, the reference's only concurrent-query-plus-
  *    metadata-churn exercise
  *    (`stress-with-invalidate-refresh.test:10-24`).
  *
  * The reference runs the file through its concurrent stress driver; the
  * Spark analogue races N query threads against a churn thread issuing the
  * dialect statements above (lowered to relation-cache invalidation +
  * file-listing refresh, [[graft.plans.InvalidateMetadataCommand]]). The
  * invariants pinned: every query returns exactly 10 under churn, no
  * statement throws, and the churn statements themselves parse through the
  * dialect (not Spark-native syntax).
  */
class StressSpec extends SparkSpec {

  private def stressCount(): Long =
    spark.sql("select count(*) from (select * from lineitem limit 10) p")
      .collect()(0).getLong(0)

  test("stress.test: STRESS-Q1 query mix is correct, repeatedly and concurrently") {
    Engine.openCatalog(spark, sfDir)
    // sequential sanity first (the file's own literal content)
    assert(stressCount() == 10L)
    val wrong = new AtomicInteger
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try (1 to 10).foreach(_ => if (stressCount() != 10L) wrong.incrementAndGet())
        catch { case e: Throwable => errors.add(e) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"query thread failed: ${Option(errors.peek()).map(_.toString)}")
    assert(wrong.get == 0, s"${wrong.get} runs returned a count != 10")
  }

  test("stress-with-invalidate-refresh.test: query mix stays correct under metadata churn") {
    Engine.openCatalog(spark, sfDir)
    // The churn statements from the file, each via the dialect parser.
    val churnStmts = Seq(
      "invalidate metadata",
      "invalidate metadata lineitem",
      "refresh lineitem")
    // parse-path pin: these must lower to the graft command, not fall
    // through to Spark's parser (bare REFRESH t / INVALIDATE are dialect)
    churnStmts.foreach { s =>
      val plan = spark.sessionState.sqlParser.parsePlan(s)
      assert(plan.isInstanceOf[plans.InvalidateMetadataCommand],
        s"'$s' parsed to ${plan.getClass.getSimpleName}")
    }

    val stop = new AtomicBoolean(false)
    val wrong = new AtomicInteger
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val started = new CountDownLatch(5)
    val queryThreads = (1 to 4).map { _ =>
      new Thread(() => {
        started.countDown()
        try (1 to 15).foreach { _ =>
          if (stressCount() != 10L) wrong.incrementAndGet()
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    val churn = new Thread(() => {
      started.countDown()
      try while (!stop.get()) churnStmts.foreach(s => spark.sql(s).collect())
      catch { case e: Throwable => errors.add(e) }
    })
    (queryThreads :+ churn).foreach(_.start())
    assert(started.await(30, TimeUnit.SECONDS))
    queryThreads.foreach(_.join(300000))
    stop.set(true)
    churn.join(300000)
    assert(!churn.isAlive, "churn thread failed to stop")
    assert(errors.isEmpty,
      s"failure under churn: ${Option(errors.peek()).map(_.toString)}")
    assert(wrong.get == 0, s"${wrong.get} runs returned a count != 10 under churn")
    // the mix's closing STRESS-Q2 after churn settles
    assert(stressCount() == 10L)
  }
}
