package graft

import java.io.File

import graft.testing.{FunctionalDataset, PlannerGoldenRunner, TpcdsDb, TpchDb}
import graft.testing.PlannerGoldenRunner._

/** Runs the reference's PlannerTest golden corpus (plan-shape parity; see
  * [[graft.testing.PlannerGoldenRunner]] for what is and isn't compared).
  *
  * Files are executed case-by-case in file order — the TPC-H fixtures chain
  * `INSERT OVERWRITE tpch.<tmp>` stages whose later stages scan the tmp
  * tables, so order matters within a file (ScalaTest runs tests in
  * registration order).
  *
  * `subquery*.test` run at ScansOnly: the reference plans every subquery as
  * a join; Spark plans scalar/IN subqueries as subquery expressions whose
  * plans this harness descends into — scan sets stay comparable, join
  * multisets deliberately don't.
  *
  * `hdfs.test` runs with partition-count parity on: each case's
  * `partitions=K/N` scan annotations are compared against the Spark scan's
  * selected-partition count and the catalog's partition total.
  *
  * Not ported from the planner corpus: `hbase.test` (node kind out of
  * scope) — every other PlannerTest file runs (22 of 23).
  * `data-source-tables.test` runs against the DSv2
  * [[graft.sources.AllTypesDataSource]] registered as
  * `functional.alltypes_datasource`; its cases pin the pushed/residual
  * conjunct SPLIT (a non-empty pushed set on the scan where the reference
  * offers conjuncts, a Filter above the scan where the reference keeps
  * residuals) rather than exact membership — Spark's pushability rules
  * (cast unwrapping, null-intolerance inference) legitimately move
  * individual conjuncts across the line. `insert.test` runs with
  * partition-count parity (its WRITE nodes carry no shape; the pruning
  * annotations on its source scans do); `ddl.test`'s CTAS cases compare
  * the SELECT's plan shape.
  * `constant.test` / `values.test` run under the constant-relation
  * leniency: the reference plans them as a UNION of constant operands,
  * Catalyst folds the whole relation (ORDER BY/LIMIT included) to a
  * `LocalRelation` — strictly stronger, so a scan-free/join-free pair
  * passes with no further shape compare.
  * `tpcds-all.test` runs against [[graft.testing.TpcdsDb]]'s synthesized
  * store_sales star schema (reference-exact schemas parsed from its dataset
  * template; values and the reference's dynamic-date partition counts are
  * data artifacts, not plan artifacts, so they are not part of the parity).
  */
class PlannerGoldenSpec extends SparkSpec {

  private val plannerDir = new File(getClass.getResource("/planner").toURI)

  private val scansOnlyFiles = Set("subquery.test", "subquery-limit.test")

  /** Files whose `partitions=K/N` scan annotations are asserted. */
  private val partitionFiles = Set("hdfs.test", "insert.test")

  /** Cases excluded with cause — each is a deliberate, documented dialect or
    * planner divergence, not a coverage gap:
    *  - aggregation[2]: Impala resolves `ORDER BY avg(zip)` against the
    *    pre-aggregation scope even when `zip` is not projected; Spark (like
    *    ANSI) resolves against the select list.
    *  - joins[7]: both join keys are the literal `1`; Catalyst
    *    constant-folds the condition and plans a (broadcast) nested-loop —
    *    same output, and hash-joining on a constant has no scale benefit.
    *  - join-order[11,12], subquery[24]: Impala lets later joins reference
    *    columns of a LEFT SEMI JOIN's right side (IMPALA-860 fixed-position
    *    planning); semi-join right-side columns are out of scope in Spark
    *    (and standard SQL).
    *  - predicate-propagation[27]: `ifnull(<numeric>, true)` relies on
    *    Impala's implicit BOOLEAN↔numeric coercion, which this engine's
    *    permissive-but-typed dialect does not replicate.
    *  - order[25]: a four-deep pyramid of nested ORDER BY..LIMIT blocks;
    *    Catalyst collapses one adjacent ordered-limit level, so the plan
    *    has 4 ordering operators to the reference's 5 — result-pinned by
    *    the ported top-n QueryTest fixtures.
    */
  private val excluded: Map[String, Set[Int]] = Map(
    "aggregation.test" -> Set(2),
    "joins.test" -> Set(7),
    "join-order.test" -> Set(11, 12),
    "subquery.test" -> Set(24),
    "predicate-propagation.test" -> Set(27),
    "order.test" -> Set(25))

  private def ensureDbs(): Unit = {
    Engine.openCatalog(spark, sfDir)
    FunctionalDataset.ensureFunctionalDb(spark)
    FunctionalDataset.ensureScaleDb(spark)
    TpchDb.ensure(spark, sfDir)
    TpcdsDb.ensure(spark)
  }

  /** tpcds-all.test queries scan unqualified table names (the reference
    * driver ran them with tpcds as the session database); Spark temp views
    * of the corpus tables (`customer`, …) would shadow a session-database
    * switch, so qualify each FROM/JOIN table reference explicitly. Column
    * qualifiers (`store_sales.ss_item_sk`) stay valid: a db-qualified
    * relation still exposes its table-name qualifier. */
  private val tpcdsTables = Seq("store_sales_unpartitioned", "store_sales",
    "customer_address", "customer_demographics", "household_demographics",
    "customer", "date_dim", "time_dim", "item", "store", "promotion")
  private def qualifyTpcds(q: String): String =
    tpcdsTables.foldLeft(q)((s, t) =>
      s.replaceAll(s"(?i)\\b(from|join)(\\s+)$t\\b", s"$$1$$2tpcds.$t"))

  plannerDir.listFiles().filter(_.getName.endsWith(".test")).sorted
    .foreach { f =>
      val level: Level =
        if (scansOnlyFiles(f.getName)) ScansOnly else Full
      val cases = PlannerGoldenRunner.parseFile(f.getPath).map { c =>
        if (f.getName == "tpcds-all.test") c.copy(query = qualifyTpcds(c.query))
        else c
      }
      cases.zipWithIndex.foreach { case (c, i) =>
        // Cases the harness can see are inapplicable up front (HBase scans,
        // `not implemented` without a cartesian assertion) are not
        // registered at all rather than reported as skips.
        val applicable =
          !excluded.getOrElse(f.getName, Set.empty).contains(i) &&
            (c.notImplemented match {
              case Some(msg) =>
                msg.contains("CROSS JOIN") || msg.contains("Cartesian")
              case None => refSignature(c).isRight
            })
        if (applicable)
          test(s"${f.getName}[$i]: " +
            c.query.linesIterator.next().take(55)) {
            ensureDbs()
            val aqe = spark.conf.get("spark.sql.adaptive.enabled")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try PlannerGoldenRunner.run(spark, c, level,
              comparePartitions = partitionFiles(f.getName)) match {
              case Pass | Superset => ()
              case Skip(reason) => cancel(reason)
              case Fail(reason) =>
                fail(s"${f.getName}[$i] $reason\nquery: ${c.query}")
            } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
          }
      }
    }

  test("parser: sections, separators, node extraction") {
    val cases = PlannerGoldenRunner.parse(
      """# a comment
        |select * from t1 join t2 on t1.id = t2.id
        |---- PLAN
        |02:HASH JOIN [INNER JOIN]
        ||  hash predicates: t1.id = t2.id
        ||
        ||--01:SCAN HDFS [functional.t2]
        ||     partitions=1/1 size=0B compact
        ||
        |00:SCAN HDFS [functional.t1]
        |   partitions=1/1 size=0B
        |---- DISTRIBUTEDPLAN
        |04:EXCHANGE [UNPARTITIONED]
        ||
        |02:HASH JOIN [INNER JOIN, BROADCAST]
        ||
        ||--03:EXCHANGE [BROADCAST]
        ||  |
        ||  01:SCAN HDFS [functional.t2]
        ||
        |00:SCAN HDFS [functional.t1]
        |====""".stripMargin.linesIterator.toSeq)
    assert(cases.length == 1)
    val sig = refSignature(cases.head).toOption.get
    assert(sig.scans == Map("t1" -> 1, "t2" -> 1))
    assert(sig.joins == Seq(RefJoin("hash", "inner", broadcast = true)),
      "broadcast flag must be merged from the DISTRIBUTEDPLAN")
    assert(sig.agg == 0 && sig.topn == 0)
  }

  test("parser: TOP-N, AGGREGATE, MERGE phases, WRITE node") {
    val cases = PlannerGoldenRunner.parse(
      """select zip, count(*) from t group by zip order by 2 limit 5
        |---- PLAN
        |02:TOP-N [LIMIT=5]
        ||
        |01:AGGREGATE [FINALIZE]
        ||  group by: zip
        ||
        |00:SCAN HDFS [functional.testtbl]
        |---- DISTRIBUTEDPLAN
        |05:MERGING-EXCHANGE [UNPARTITIONED]
        ||
        |02:TOP-N [LIMIT=5]
        ||
        |04:AGGREGATE [MERGE FINALIZE]
        ||
        |03:EXCHANGE [HASH(zip)]
        ||
        |01:AGGREGATE
        ||
        |00:SCAN HDFS [functional.testtbl]
        |====""".stripMargin.linesIterator.toSeq)
    val sig = refSignature(cases.head).toOption.get
    assert(sig.topn == 1 && sig.agg == 1)
    assert(sig.scans == Map("testtbl" -> 1))
  }
}
