package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** `LOAD DATA INPATH '<path>' [OVERWRITE] INTO TABLE t [PARTITION (...)]` —
  * the reference's file-move DML (`fe/.../analysis/LoadDataStmt.java`,
  * grammar `sql-parser.y:470`, response text `Frontend.java:383`): data
  * files are *moved* (not rewritten) into the table's (or partition's)
  * directory, then the table metadata is refreshed. The files must already
  * be in the table's storage format — exactly the reference's contract
  * (LoadDataStmt only verifies access and moves).
  */
object LoadData {

  /** Outcome of a load: files moved in, and total data files now present
    * in the destination directory (the two numbers in the reference's
    * response line). */
  case class LoadResult(moved: Int, total: Int)

  /** Move every data file at `src` (a file or a directory) into `table`'s
    * location — or its `partition` subdirectory — and return the counts.
    *
    * OVERWRITE follows the reference's staging order (`Frontend.java`
    * loadTableData: sources are moved aside BEFORE the destination is
    * cleared), so loading a directory onto itself replaces nothing and
    * loses nothing — the fixture's self-load cases pin this. Name
    * collisions on non-overwrite loads get a `_copy_N` suffix, as Hive
    * spells it. With `isLocal` (LOAD DATA LOCAL), the source resolves on
    * the LOCAL filesystem and files are COPIED, not moved — Hive's LOCAL
    * contract (the reference has no LOCAL variant; its loads are HDFS
    * moves). */
  def loadData(spark: SparkSession, srcDir: String, table: String,
               overwrite: Boolean = false,
               partition: Seq[(String, String)] = Nil,
               isLocal: Boolean = false): LoadResult = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val conf = spark.sparkContext.hadoopConfiguration
    // the spec must name partition columns only, and all of them — the
    // reference's LoadDataStmt analyzer errors on anything else (a bad
    // spec must not silently drop files into the table root)
    val partCols = meta.partitionColumnNames
    partition.foreach { case (k, _) =>
      require(partCols.exists(_.equalsIgnoreCase(k)),
        s"'$k' is not a partition column of $table " +
          s"(partition columns: ${partCols.mkString(", ")})")
    }
    require(partition.isEmpty || partition.size == partCols.size,
      s"LOAD DATA must specify all ${partCols.size} partition column(s) " +
        s"of $table")
    // a partitioned target REQUIRES the spec (LoadDataStmt.java analysis) —
    // otherwise the files would land in the table root, invisible to scans
    require(partCols.isEmpty || partition.nonEmpty,
      s"LOAD DATA into partitioned table $table requires a PARTITION clause " +
        s"naming (${partCols.mkString(", ")})")
    // partition values land in canonical column order, whatever order the
    // statement spelled them in, with Hive path escaping — the same dirs
    // Spark's own partitioned writes produce
    val partPath = partCols.flatMap { pc =>
      partition.find(_._1.equalsIgnoreCase(pc)).map { case (_, v) =>
        s"$pc=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)}"
      }
    }
    val loc = partPath.foldLeft(new Path(meta.location)) { (p, seg) =>
      new Path(p, seg)
    }
    // the reference's LoadDataStmt analysis requires the target partition
    // to EXIST in the catalog; files moved into an unregistered partition
    // directory would be invisible to scans (REFRESH does not register new
    // partitions on a catalog-partitioned table)
    if (partition.nonEmpty) {
      val spec = partCols.flatMap(pc =>
        partition.find(_._1.equalsIgnoreCase(pc)).map(pc -> _._2)).toMap
      val catalog = spark.sessionState.catalog
      val known = catalog.listPartitions(
        org.apache.spark.sql.catalyst.TableIdentifier(
          meta.identifier.table, meta.identifier.database))
      require(known.exists(_.spec == spec),
        s"LOAD DATA: partition (${spec.map { case (k, v) => s"$k='$v'" }
          .mkString(", ")}) does not exist in $table — " +
          "ALTER TABLE ... ADD PARTITION first, as the reference requires")
    }
    val fs = loc.getFileSystem(conf)
    if (!fs.exists(loc)) fs.mkdirs(loc)
    val src = if (isLocal && new java.net.URI(srcDir).getScheme == null)
      new Path("file", null, new Path(srcDir).toUri.getPath)
    else new Path(srcDir)
    val srcFs = src.getFileSystem(conf)

    def isData(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def listData(f: FileSystem, d: Path): Seq[Path] =
      if (f.getFileStatus(d).isFile) Seq(d)
      else f.listStatus(d).map(_.getPath).filter(isData).toSeq

    // rename only works within one filesystem (it THROWS "Wrong FS" rather
    // than returning false across filesystems), so pick the strategy by URI.
    val sameFs = !isLocal && srcFs.getUri == fs.getUri
    def moveTo(f: Path, dir: Path, from: FileSystem, fromSame: Boolean): Path = {
      var target = new Path(dir, f.getName)
      var n = 0
      while (fs.exists(target)) { // collision: suffix like Hive's copy_N
        n += 1
        target = new Path(dir, s"${f.getName}_copy_$n")
      }
      val moved =
        if (fromSame) fs.rename(f, target)
        else org.apache.hadoop.fs.FileUtil.copy(from, f, fs, target,
          /* deleteSource = */ !isLocal, conf)
      require(moved, s"failed to move $f to $target")
      target
    }

    val files = listData(srcFs, src)
    // a self-load (source resolves to the destination directory itself):
    // the files are already in place. The reference still reports them as
    // loaded — load.test pins `Loaded 9 file(s). Total files in destination
    // location: 9` for the non-overwrite self-load — so count them moved
    // but do NOT rename them onto themselves (_copy_N churn).
    val srcParent =
      if (srcFs.getFileStatus(src).isFile) src.getParent else src
    val selfLoad = sameFs &&
      srcFs.makeQualified(srcParent) == fs.makeQualified(loc)
    if (selfLoad && !overwrite) {
      val total = listData(fs, loc).length
      spark.sql(s"REFRESH TABLE $table")
      return LoadResult(files.length, total)
    }
    if (overwrite) {
      // stage sources inside the destination fs first, then clear, then
      // promote — the self-load-with-overwrite order the reference uses
      val staging = new Path(loc, ".graft_load_staging")
      fs.mkdirs(staging)
      val staged = files.map(f => moveTo(f, staging, srcFs, sameFs))
      listData(fs, loc).foreach(p => require(fs.delete(p, true),
        s"LOAD DATA OVERWRITE: failed to delete $p"))
      staged.foreach(f => moveTo(f, loc, fs, fromSame = true))
      fs.delete(staging, true)
    } else
      files.foreach(f => moveTo(f, loc, srcFs, sameFs))

    val total = listData(fs, loc).length
    spark.sql(s"REFRESH TABLE $table")
    LoadResult(files.length, total)
  }
}
