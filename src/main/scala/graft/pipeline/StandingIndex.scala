package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Build-once lifecycle for standing on-disk artifacts (the IVF ANN index,
  * the MinHash signature table): fingerprint-keyed location + atomic
  * publish. The contract both callers rely on:
  *
  *  - **Freshness**: the artifact directory name embeds a fingerprint of
  *    the source table (absolute-path hash + total bytes + newest mtime),
  *    so a regenerated corpus can never be probed through a stale artifact.
  *  - **Atomic publish**: builders write into a process-unique staging
  *    directory, drop a `graft_index_ready` marker, and ATOMIC_MOVE the
  *    whole directory into place. Two concurrent builders (e.g. Bench and
  *    Verify racing on a fresh corpus) each complete a private build; one
  *    rename wins, the loser discards its staging copy and probes the
  *    winner's identical artifact. Nobody can observe a half-built index.
  *  - **Self-heal** (ADVICE r17): a marker-less target directory (a killed
  *    run of the old build-in-place code, a partial copy) would make the
  *    rename fail forever. On rename failure with no marker present, the
  *    stale target is deleted and the rename retried once — the complete
  *    staging copy replaces the debris. Staging is always removed on exit,
  *    success or failure.
  */
object StandingIndex {

  /** Fingerprint-keyed artifact directory for `<dir>/<table>.parquet` under
    * the JVM tmpdir: `<prefix>_<pathKey>_<bytes>_<mtime>`. */
  def artifactDir(dir: String, table: String, prefix: String): Path = {
    val src = Paths.get(dir, s"$table.parquet")
    val (size, mtime) =
      if (Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        val stream = Files.list(src)
        val parts =
          try stream.iterator().asScala.toSeq
          finally stream.close()
        require(parts.nonEmpty,
          s"empty $table.parquet directory at $src — cannot fingerprint an empty corpus")
        (parts.map(Files.size).sum,
         parts.map(p => Files.getLastModifiedTime(p).toMillis).max)
      } else (Files.size(src), Files.getLastModifiedTime(src).toMillis)
    val key = Integer.toHexString(src.toAbsolutePath.toString.hashCode)
    Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_${key}_${size}_$mtime")
  }

  def readyMarker(idxDir: Path): Path = idxDir.resolve("graft_index_ready")

  private def deleteTree(p: Path): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)

  /** Run `build(stagingPath)` and publish the result at `idxDir` unless a
    * ready artifact is already there. See the object scaladoc for the
    * atomicity / self-heal contract. */
  def ensure(idxDir: Path)(build: String => Unit): Unit = {
    val marker = readyMarker(idxDir)
    if (Files.exists(marker)) return
    val staging = Paths.get(sys.props("java.io.tmpdir"),
      s"${idxDir.getFileName}_build_${java.lang.ProcessHandle.current.pid}_${System.nanoTime}")
    try {
      build(staging.toString)
      Files.write(staging.resolve("graft_index_ready"), Array.emptyByteArray)
      try Files.move(staging, idxDir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          if (Files.exists(marker)) () // concurrent builder won; use theirs
          else {
            // marker-less debris at the target: replace it with our
            // complete staging copy (delete + one retry); if another healer
            // beat us to the retry, their artifact is ready — use it.
            if (Files.exists(idxDir)) deleteTree(idxDir)
            try Files.move(staging, idxDir, StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.FileSystemException
                  if Files.exists(marker) => ()
              case _: java.nio.file.FileSystemException => throw e
            }
          }
      }
    } finally {
      if (Files.exists(staging)) deleteTree(staging)
    }
  }
}
