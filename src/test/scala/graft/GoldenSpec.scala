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
        testing.FunctionalDataset.ensureFunctionalDb(spark)
        testing.FunctionalDataset.ensureScaleDb(spark)
        testing.TpchDb.ensure(spark, sfDir)
        testing.TpcdsDb.ensure(spark)
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

  test("statement split and ORDER BY detection are quote-aware") {
    // A ';' and an 'order by' inside string literals must not split the
    // statement or mark the case ordered; an ORDER BY in a setup statement
    // must not leak onto the final query.
    val cases = GoldenTestRunner.parse(
      """---- QUERY
        |select 'a;b' as x, 'use order by wisely' as y
        |---- RESULTS
        |'a;b','use order by wisely'
        |====
        |---- QUERY
        |create temporary view golden_tmp_ob as select 1 as c order by 1;
        |select c from golden_tmp_ob
        |---- RESULTS
        |1
        |====
        |---- QUERY
        |select c from (select 1 as c) t order by c
        |---- RESULTS
        |1
        |====""".stripMargin.linesIterator.toSeq)
    assert(!cases(0).ordered, "quoted 'order by' must not mark ordered")
    assert(!cases(1).ordered, "setup-statement ORDER BY must not mark ordered")
    assert(cases(2).ordered, "top-level ORDER BY must mark ordered")
    assert(GoldenTestRunner.run(spark, cases(0)) == Pass,
      "literal ';' must not split the statement")
    assert(GoldenTestRunner.run(spark, cases(1)) == Pass)
  }

  test("MULTISET_CELLS compares string cells order-insensitively") {
    val cases = GoldenTestRunner.parse(
      """---- QUERY
        |select 1 as g, 'b, a, c' as s
        |---- TYPES
        |int, string
        |---- RESULTS: MULTISET_CELLS(, )
        |1,'a, b, c'
        |====
        |---- QUERY
        |select 1 as g, 'b, a, a' as s
        |---- RESULTS: MULTISET_CELLS(, )
        |1,'a, b, b'
        |====""".stripMargin.linesIterator.toSeq)
    assert(cases(0).multisetSep.contains(", "))
    assert(GoldenTestRunner.run(spark, cases(0)) == Pass,
      "same tokens in different order must pass under MULTISET_CELLS")
    assert(GoldenTestRunner.run(spark, cases(1)) != Pass,
      "different token multiplicities must still fail")
  }

  test("a broad row_regex cannot steal the only row a narrow one matches") {
    // unordered compare with two regexes: 'a.' matches both rows, 'aa'
    // matches only one. Greedy first-match would hand 'aa' (first in sorted
    // order) to the broad pattern and fail the narrow one — the bipartite
    // matching must pass the set, and still fail when a row is truly absent.
    val cases = GoldenTestRunner.parse(
      """---- QUERY
        |select 'aa' as s union all select 'ab'
        |---- RESULTS
        |row_regex: 'a.'
        |row_regex: 'aa'
        |====
        |---- QUERY
        |select 'ab' as s union all select 'ab'
        |---- RESULTS
        |row_regex: 'a.'
        |row_regex: 'aa'
        |====""".stripMargin.linesIterator.toSeq)
    assert(GoldenTestRunner.run(spark, cases(0)) == Pass,
      "bipartite matching must find the regex->row assignment")
    assert(GoldenTestRunner.run(spark, cases(1)) != Pass,
      "a pattern with no matching row must still fail")
  }
}
