package graft

import java.nio.file.{Files, Paths}

/** Pins the engine's single lineage-cut policy ([[Engine.materialize]]):
  * local blocks on a bare session, the fault-tolerant reliable checkpoint
  * the moment a checkpoint directory is configured — the switch every
  * pipeline call site (tfidf, BM25, connected components, semantic dedup,
  * iterated k-means) inherits with no code change. */
class MaterializeSpec extends SparkSpec {

  test("materialize truncates lineage with local blocks when no checkpoint dir") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = Engine.materialize(spark.range(100).toDF("v"))
    assert(df.count() == 100)
    // a true lineage cut: the source operator is gone from the plan
    assert(!df.queryExecution.optimizedPlan.toString.contains("Range"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("materialize writes a reliable checkpoint when a dir is configured") {
    val dir = tmp("ckptdir")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Engine.materialize(spark.range(50).toDF("v"))
      assert(df.count() == 50)
      assert(!df.queryExecution.optimizedPlan.toString.contains("Range"))
      // the materialization lives in fault-tolerant storage, not executor
      // memory: RDD checkpoint part-files exist under the configured dir
      val stream = Files.walk(Paths.get(dir))
      val partFiles =
        try stream.filter(p => Files.isRegularFile(p) &&
              p.getFileName.toString.startsWith("part-"))
          .count()
        finally stream.close()
      assert(partFiles > 0, s"no checkpoint part-files under $dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("reliable materialize computes the plan ONCE (persist before checkpoint)") {
    val dir = tmp("ckptonce")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      // RDD checkpointing runs a second job to write the files; without the
      // persist-before-checkpoint in Engine.materialize that job recomputes
      // the whole plan — the accumulator would read 2n, not n.
      val evals = spark.sparkContext.longAccumulator("evals")
      val counted = org.apache.spark.sql.functions.udf { (v: Long) =>
        evals.add(1L); v
      }
      val df = Engine.materialize(
        spark.range(0, 1000, 1, 4).toDF("v")
          .select(counted(org.apache.spark.sql.functions.col("v")).as("v")))
      assert(df.count() == 1000)
      assert(evals.value == 1000L,
        s"plan evaluated ${evals.value} times per row — checkpoint recomputed")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("releaseMaterialized deletes reliable checkpoint files (iterative loops)") {
    val dir = tmp("ckptrel")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Engine.materialize(spark.range(50).toDF("v"))
      assert(df.count() == 50)
      def partFiles(): Long = {
        val stream = Files.walk(Paths.get(dir))
        try stream.filter(p => Files.isRegularFile(p) &&
              p.getFileName.toString.startsWith("part-")).count()
        finally stream.close()
      }
      assert(partFiles() > 0)
      Engine.releaseMaterialized(df)
      assert(partFiles() == 0,
        "checkpoint files survived release — a 64-round CC run would " +
          "accumulate rounds x cuts of them")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("releaseMaterialized frees local-checkpoint blocks; no-op on plain frames") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = Engine.materialize(spark.range(20).toDF("v"))
    assert(df.count() == 20)
    val rdd = df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"expected LogicalRDD, got ${other.getClass}")
    }
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
    Engine.releaseMaterialized(df)
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "local-checkpoint blocks still pinned after release")
    // non-materialized frame: release must be a safe no-op
    Engine.releaseMaterialized(spark.range(5).toDF("v"))
  }

  test("releaseMaterialized never touches a LogicalRDD frame it did not make") {
    // A caller's own localCheckpoint is plan-shape-identical to a
    // materialize() output (LogicalRDD over persisted blocks) — release is
    // tracked by RDD id, so foreign frames keep their blocks (ADVICE r13).
    val foreign = spark.range(30).toDF("v").localCheckpoint(eager = true)
    val rdd = foreign.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"expected LogicalRDD, got ${other.getClass}")
    }
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
    Engine.releaseMaterialized(foreign)
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "release unpersisted a frame that did not come from materialize()")
    // A released id leaves the tracking set: double-release is also a no-op.
    val mine = Engine.materialize(spark.range(10).toDF("v"))
    assert(mine.count() == 10)
    Engine.releaseMaterialized(mine)
    Engine.releaseMaterialized(mine)
  }
}
