package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The standing MinHash signature artifact ([[graft.pipeline.MinhashIndex]])
  * and the shared build-once lifecycle ([[graft.pipeline.StandingIndex]]). */
class MinhashIndexSpec extends SparkSpec {

  private def docs = Tables.table(spark, sfDir, "documents")

  test("indexed probe returns exactly the inline pipeline's pairs") {
    import spark.implicits._
    val dir = tmp("graft_mh_idx")
    pipeline.MinhashIndex.buildSignatures(docs, dir)
    val indexed = pipeline.MinhashIndex.pairsIndexed(spark, dir)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val inline = pipeline.DedupQueries.minhashPairs(docs)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(indexed == inline,
      s"indexed n=${indexed.size} inline n=${inline.size}")
    assert(inline.nonEmpty, "fixture corpus should contain near-dup pairs")
  }

  test("probe plan never touches the documents text — only the artifact") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = tmp("graft_mh_scan")
    pipeline.MinhashIndex.buildSignatures(docs, dir)
    val plan = pipeline.MinhashIndex.pairsIndexed(spark, dir)
      .queryExecution.optimizedPlan
    var tables = Map.empty[String, Int].withDefaultValue(0)
    (plan +: plan.subqueriesAll).foreach(_.foreach {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.foreach { p =>
          val t = p.getName.stripSuffix(".parquet")
          tables = tables.updated(t, tables(t) + 1)
        }
      case _ => ()
    })
    assert(tables("documents") == 0,
      s"probe must not re-scan the corpus text: $tables")
    assert(tables("signatures") == 4,
      s"expected 4 column-pruned artifact reads (2 band sides + 2 verify sides): $tables")
    assert(tables("members") == 4,
      s"expected 4 thin member-map reads (2 intra + 2 cross expansion sides): $tables")
  }

  test("candidate reads prune to (doc_id, sig); verify reads prune to (doc_id, sh_sorted)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val dir = tmp("graft_mh_prune")
    pipeline.MinhashIndex.buildSignatures(docs, dir)
    val df = pipeline.MinhashIndex.pairsIndexed(spark, dir)
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec        => flatten(q.plan)
        case _                        => Seq.empty
      }
      p +: (p.children.flatMap(flatten) ++ nested)
    }
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet }
    assert(scans.nonEmpty)
    // No artifact scan may read all three payload columns — each probe
    // stage touches exactly the columns it needs (the artifact exists to
    // make these scans narrow).
    scans.foreach { cols =>
      assert(!(cols.contains("sig") && cols.contains("sh_sorted")),
        s"unpruned artifact scan reads both payloads: $cols")
    }
  }

  test("ensure() self-heals marker-less debris at the target (ADVICE r17)") {
    val debris = Paths.get(tmp("graft_mh_debris"), "idx")
    Files.createDirectories(debris)
    Files.write(debris.resolve("junk"), "half-built".getBytes)
    // no ready marker — the old code's rename would fail here forever
    pipeline.StandingIndex.ensure(debris) { staging =>
      Files.createDirectories(Paths.get(staging))
      Files.write(Paths.get(staging, "payload"), "ok".getBytes)
    }
    assert(Files.exists(pipeline.StandingIndex.readyMarker(debris)),
      "self-heal must publish the fresh build over the debris")
    assert(Files.exists(debris.resolve("payload")))
    assert(!Files.exists(debris.resolve("junk")), "debris must be replaced")
  }

  test("ensure() skips the build when the artifact is ready, and cleans staging on failure") {
    val idx = Paths.get(tmp("graft_mh_ready"), "idx")
    Files.createDirectories(idx)
    Files.write(pipeline.StandingIndex.readyMarker(idx), Array.emptyByteArray)
    pipeline.StandingIndex.ensure(idx) { _ =>
      fail("build must not run when the marker is present")
    }
    // failure path: the staging dir must not leak
    val idx2 = Paths.get(tmp("graft_mh_fail"), "idx")
    val tmpdir = Paths.get(sys.props("java.io.tmpdir"))
    def stagingDirs() = {
      val s = Files.list(tmpdir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith("idx_build_"))
      } finally s.close()
    }
    val before = stagingDirs()
    intercept[RuntimeException] {
      pipeline.StandingIndex.ensure(idx2) { staging =>
        Files.createDirectories(Paths.get(staging))
        throw new RuntimeException("boom")
      }
    }
    assert(stagingDirs() == before, "failed build leaked its staging dir")
    assert(!Files.exists(idx2), "failed build must not publish")
  }

  test("artifact fingerprint tracks the source corpus bytes") {
    val a = pipeline.StandingIndex.artifactDir(sfDir, "documents", "p")
    val b = pipeline.StandingIndex.artifactDir(sfDir, "documents", "p")
    assert(a == b, "same corpus must key the same artifact")
    val other = pipeline.StandingIndex.artifactDir(sfDir, "embeddings", "p")
    assert(a != other, "different sources must key different artifacts")
  }
}
