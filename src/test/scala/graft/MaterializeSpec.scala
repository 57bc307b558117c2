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
}
