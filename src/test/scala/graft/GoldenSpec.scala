package graft

import java.io.File

import graft.testing.GoldenTestRunner
import graft.testing.GoldenTestRunner.{Fail, Pass}

/** Runs every golden `.test` fixture (reference format, SURVEY §5.3)
  * through Engine.sql. */
class GoldenSpec extends SparkSpec {

  private val goldenDir =
    new File(getClass.getResource("/golden").toURI)

  goldenDir.listFiles().filter(_.getName.endsWith(".test")).sorted.foreach { f =>
    val cases = GoldenTestRunner.parseFile(f.getPath)
    cases.zipWithIndex.foreach { case (c, i) =>
      test(s"${f.getName}[$i]: ${c.query.linesIterator.next().take(60)}") {
        Engine.openCatalog(spark, sfDir)
        testing.FunctionalDataset.registerViews(spark)
        GoldenTestRunner.run(spark, c) match {
          case Pass => ()
          case Fail(reason) => fail(s"${f.getName}[$i] $reason\nquery: ${c.query}")
        }
      }
    }
  }

  test("parser handles sections, separators and CATCH") {
    val cases = GoldenTestRunner.parse(
      """---- QUERY
        |SELECT 1
        |---- TYPES
        |int
        |---- RESULTS
        |1
        |====
        |---- QUERY
        |SELECT bad syntax here
        |---- CATCH
        |PARSE_SYNTAX_ERROR
        |====""".stripMargin.linesIterator.toSeq)
    assert(cases.length == 2)
    assert(cases(0).types.contains(Seq("int")))
    assert(cases(1).catchErr.contains("PARSE_SYNTAX_ERROR"))
  }
}
