package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.Random

import org.apache.spark.sql.functions._

/** Differential fuzzer for the incremental standing-artifact LIFECYCLE
  * ([[graft.pipeline.DeltaIndex]] + the MinhashIndex incremental/compact
  * entry points) — the machinery StreamFuzz is to streaming and
  * FormatFuzz is to the legacy scanners. Each case drives a random event
  * sequence against a private corpus directory:
  *
  *  - `append`      — a new part file of salted docs (exact dups,
  *                    1–2-token near-dups, sub-shingle-floor shorties,
  *                    empty strings — the shapes the contraction and
  *                    floor-exclusion branches care about)
  *  - `regenerate`  — in-place rewrite of a covered part file (bumped
  *                    mtime), the INVALIDATE trigger
  *  - `compact`     — the artifact-level rebase
  *  - crash debris  — delete the manifest (legacy-heal path), rewind it
  *                    to a strict prefix (crashed swap), or plant an
  *                    unreferenced ready batch dir (crashed compaction)
  *
  * After EVERY reconcile ([[graft.pipeline.MinhashIndex.ensureIncremental]])
  * the artifact probe (`pairsIndexedMulti` over the live snapshot) must
  * equal the inline sweep (`DedupQueries.minhashPairs`) over the corpus'
  * CURRENT on-disk state, pair-for-pair including jaccard values. The
  * debris ops deliberately precede reconciles, so every self-heal path
  * (manifest rewrite, coverage rebuild, content-key adoption, orphan GC)
  * is crossed by random states, not just the spec's hand-built ones.
  *
  * Run: `java -cp ... graft.LifecycleFuzz [cases] [seed]`. Exit 1 on any
  * divergence; per-case seeds print with failures so a case replays
  * standalone.
  */
object LifecycleFuzz {

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)

  def main(args: Array[String]): Unit = {
    val nCases = args.headOption.map(_.toInt).getOrElse(100)
    val seed0 = args.lift(1).map(_.toLong).getOrElse(20260826L)
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    var fails = 0
    def check(cond: Boolean, seed: Long, what: => String): Unit =
      if (!cond) { fails += 1; System.err.println(s"[lifecycle-fuzz] FAIL seed=$seed: $what") }

    for (caseId <- 0 until nCases) {
      val seed = seed0 + caseId
      val rng = new Random(seed)
      val dir = Files.createTempDirectory(s"graft_lcfuzz_$caseId").toString
      val table = Paths.get(dir, "documents.parquet")
      Files.createDirectories(table)
      val root = pipeline.DeltaIndex.root(dir, "documents", "graft_minhash_inc_v1")
      deleteTree(root)

      val vocab = Array.fill(40 + rng.nextInt(60))(s"w${rng.nextInt(400)}")
      def mkText(n: Int) =
        Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      var nextId = 0L
      var texts = Vector.empty[String] // corpus texts, for dup/near-dup salting
      def mkDocs(n: Int): Seq[(Long, String, String)] = (0 until n).map { _ =>
        val roll = rng.nextInt(10)
        val text =
          if (roll == 0 && texts.nonEmpty) texts(rng.nextInt(texts.size)) // exact dup
          else if (roll == 1 && texts.nonEmpty) { // 1-token near-dup
            val t = texts(rng.nextInt(texts.size)).split(" ")
            if (t.length > 3) {
              t(rng.nextInt(t.length)) = vocab(rng.nextInt(vocab.length))
              t.mkString(" ")
            } else mkText(4 + rng.nextInt(20))
          }
          else if (roll == 2) mkText(rng.nextInt(3)) // below the shingle floor
          else mkText(4 + rng.nextInt(25))
        texts :+= text
        val id = nextId; nextId += 1
        (id, text, "en")
      }
      def writePart(name: String, docs: Seq[(Long, String, String)]): Unit = {
        val staging = Files.createTempDirectory("graft_lcfuzz_part").toString
        docs.toDF("doc_id", "text", "lang").coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val f = Files.list(Paths.get(staging))
          .filter(_.toString.endsWith(".parquet")).findFirst.get
        Files.move(f, table.resolve(name), StandardCopyOption.REPLACE_EXISTING)
        deleteTree(Paths.get(staging))
      }
      var nParts = 0
      def append(): Unit = {
        writePart(s"part-$nParts.parquet", mkDocs(5 + rng.nextInt(15)))
        nParts += 1
      }

      def reconcileAndCheck(tag: String): Unit = {
        val dirs = pipeline.MinhashIndex.ensureIncremental(spark, dir)
        val got = pipeline.MinhashIndex.pairsIndexedMulti(spark, dirs)
          .as[(Long, Long, Double)].collect().sorted.toSeq
        val want = pipeline.DedupQueries
          .minhashPairs(spark.read.parquet(table.toString))
          .as[(Long, Long, Double)].collect().sorted.toSeq
        check(got == want, seed,
          s"$tag: probe=${got.size} pairs, inline=${want.size}; " +
            s"first diff=${got.zipAll(want, null, null).find(p => p._1 != p._2)}")
      }

      append()
      reconcileAndCheck("initial")
      val nEvents = 3 + rng.nextInt(5)
      for (_ <- 0 until nEvents) {
        rng.nextInt(7) match {
          case 0 | 1 => // append + reconcile
            append(); reconcileAndCheck("append")
          case 2 => // compact, then probe through a plain reconcile
            pipeline.MinhashIndex.compactIncremental(spark, dir)
            reconcileAndCheck("compact")
          case 3 => // regenerate a covered part in place -> invalidation
            val which = rng.nextInt(nParts)
            writePart(s"part-$which.parquet", mkDocs(4 + rng.nextInt(10)))
            Files.setLastModifiedTime(table.resolve(s"part-$which.parquet"),
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis + 60000))
            reconcileAndCheck("regenerate")
          case 4 => // crash debris: manifest deleted (legacy-heal)
            Files.deleteIfExists(root.resolve("_manifest.txt"))
            reconcileAndCheck("manifest-deleted")
          case 5 => // crash debris: manifest rewound to a strict prefix
            val mf = root.resolve("_manifest.txt")
            if (Files.exists(mf)) {
              val lines = Files.readAllLines(mf)
              Files.write(mf, lines.subList(0, rng.nextInt(lines.size))
                .toArray.mkString("\n").getBytes("UTF-8"))
            }
            reconcileAndCheck("manifest-rewound")
          case 6 => // crash debris: unreferenced ready batch dir
            val live = pipeline.DeltaIndex.liveBatches(root)
            if (live.nonEmpty) {
              val orphan = root.resolve(f"batch_${900000 + rng.nextInt(1000)}%06d_orph")
              org.apache.commons.io.FileUtils
                .copyDirectory(live(rng.nextInt(live.size)).toFile, orphan.toFile)
            }
            reconcileAndCheck("orphan-planted")
        }
      }

      deleteTree(root)
      deleteTree(Paths.get(dir))
      if ((caseId + 1) % 20 == 0)
        System.err.println(s"[lifecycle-fuzz] ${caseId + 1}/$nCases cases")
    }

    println(s"lifecycle-fuzz: n=$nCases seed=$seed0 failures=$fails")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
