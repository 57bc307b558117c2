package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** `LOAD DATA INPATH '<dir>' INTO TABLE t` — the reference's file-move DML
  * (`fe/.../analysis/LoadDataStmt.java`, grammar `sql-parser.y:470`): data
  * files are *moved* (not rewritten) into the table's directory, then the
  * table metadata is refreshed. The files must already be in the table's
  * storage format — exactly the reference's contract (LoadDataStmt only
  * verifies access and moves).
  */
object LoadData {

  /** Move every data file under `srcDir` into `table`'s location; with
    * `overwrite`, existing data files are removed first (LOAD DATA ...
    * OVERWRITE INTO). Returns the number of files moved. */
  def loadData(spark: SparkSession, srcDir: String, table: String,
               overwrite: Boolean = false): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new Path(spark.sessionState.catalog.getTableMetadata(ident)
      .location)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = loc.getFileSystem(conf)
    val src = new Path(srcDir)
    val srcFs = src.getFileSystem(conf)

    def isData(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")

    if (overwrite)
      fs.listStatus(loc).map(_.getPath).filter(isData)
        .foreach(p => require(fs.delete(p, true),
          s"LOAD DATA OVERWRITE: failed to delete $p"))

    // rename only works within one filesystem (it THROWS "Wrong FS" rather
    // than returning false across filesystems), so pick the strategy by URI.
    val sameFs = srcFs.getUri == fs.getUri
    val files = srcFs.listStatus(src).map(_.getPath).filter(isData)
    files.foreach { f =>
      var target = new Path(loc, f.getName)
      var n = 0
      while (fs.exists(target)) { // collision: suffix like Hive's copy_N
        n += 1
        target = new Path(loc, s"${f.getName}_copy_$n")
      }
      val moved =
        if (sameFs) fs.rename(f, target)
        else org.apache.hadoop.fs.FileUtil.copy(srcFs, f, fs, target, true, conf)
      require(moved, s"failed to move $f to $target")
    }
    spark.sql(s"REFRESH TABLE $table")
    files.length
  }
}
