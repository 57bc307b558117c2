package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local session, graft extensions on. */
object SparkSpec {
  lazy val spark: SparkSession = Engine.session("local[4]")
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir

  private val tmpDirs = scala.collection.mutable.ListBuffer.empty[Path]

  /** Temp dir that is deleted recursively in afterAll — test data must not
    * outlive the suite (leak-tracked environment). */
  def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tmpDirs.synchronized { tmpDirs += p }
    p.toString
  }

  override def afterAll(): Unit = {
    tmpDirs.synchronized {
      tmpDirs.foreach { p =>
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
      }
      tmpDirs.clear()
    }
    super.afterAll()
  }
}
