package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Optimistic-concurrency commit log for a lakehouse table — the
  * multi-writer protocol Delta/Iceberg run on object stores, reproduced
  * over the one primitive a filesystem gives you: an atomic
  * create-if-absent.
  *
  * A table = a `_log/` of versioned manifests, each the COMPLETE list of
  * (partition, dataDir) entries active in that snapshot. Committing
  * version v is a compare-and-swap on the file `_log/v000…v.txt`:
  * content is staged to a temp file and PUBLISHED WITH A HARD LINK —
  * `Files.createLink` is atomic and fails if the target exists, so
  * exactly one of any number of racing writers claims a version, and no
  * reader can ever observe a half-written manifest (the link appears
  * with its full content or not at all). This is precisely Delta's
  * put-if-absent contract (S3's `If-None-Match`, ABFS's conditional
  * create); the local-FS hard link stands in for it.
  *
  * Conflict rule (replace-partition commits): a loser re-reads the log,
  * diffs every manifest that landed after its snapshot read, and
  *  - REBASEs if the interleaved commits touched only OTHER partitions
  *    (its own replacement is still valid — re-issue it on top of the
  *    new snapshot, same as Delta's logical conflict resolution);
  *  - ABORTs with [[ConflictException]] if any interleaved commit
  *    touched ITS partition (the data it computed is stale — the caller
  *    must recompute, not blindly retry).
  * Scale note: the log is metadata — manifests are bounded by partition
  * count, never data volume; commit latency is one link syscall; data
  * files are written BEFORE the CAS and never rewritten on rebase.
  */
object OccLog {

  final case class Manifest(version: Int, entries: Map[String, String])

  final class ConflictException(msg: String) extends RuntimeException(msg)

  private def logDir(root: String): Path = Paths.get(root, "_log")
  private def commitPath(root: String, v: Int): Path =
    logDir(root).resolve(f"v$v%05d.txt")

  private def render(entries: Map[String, String]): Array[Byte] =
    entries.toSeq.sortBy(_._1)
      .map { case (p, dir) => s"$p\t$dir" }.mkString("\n")
      .getBytes("UTF-8")

  private def parse(p: Path): Map[String, String] =
    new String(Files.readAllBytes(p), "UTF-8").split("\n")
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        line.substring(0, i) -> line.substring(i + 1)
      }.toMap

  /** Unconditional v1 bootstrap (table creation is single-writer). */
  def init(root: String, entries: Map[String, String]): Unit = {
    Files.createDirectories(logDir(root))
    val tmp = Files.createTempFile(logDir(root), ".v1-", ".tmp")
    Files.write(tmp, render(entries))
    Files.createLink(commitPath(root, 1), tmp)
    Files.deleteIfExists(tmp)
    ()
  }

  def read(root: String, v: Int): Manifest = Manifest(v, parse(commitPath(root, v)))

  def readLatest(root: String): Manifest = {
    val st = Files.list(logDir(root))
    val vs =
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d{5}\\.txt") => n.substring(1, 6).toInt }
        .toSeq
      finally st.close() // called inside the CAS retry loop — don't leak an fd per attempt
    require(vs.nonEmpty, s"no committed version under $root/_log")
    read(root, vs.max)
  }

  /** CAS-claim version v with the given full manifest. True iff THIS
    * writer won the version. */
  def tryCommit(root: String, v: Int, entries: Map[String, String]): Boolean = {
    val tmp = Files.createTempFile(logDir(root), f".v$v%05d-", ".tmp")
    Files.write(tmp, render(entries))
    try { Files.createLink(commitPath(root, v), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }

  /** Replace `partition`'s data dir on top of snapshot `readVersion`,
    * rebasing over disjoint concurrent commits; returns the committed
    * version. Throws [[ConflictException]] when an interleaved commit
    * touched the same partition. */
  def commitReplacePartition(root: String, partition: String, dataDir: String,
      readVersion: Int, maxAttempts: Int = 20): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val cur = readLatest(root)
      if (cur.version > readVersion) {
        // diff each interleaved commit against its parent: which
        // partitions did it add/remove/repoint?
        val touched = ((readVersion + 1) to cur.version).flatMap { v =>
          val prev = read(root, v - 1).entries
          val now = read(root, v).entries
          (prev.keySet ++ now.keySet).filter(k => prev.get(k) != now.get(k))
        }.toSet
        if (touched.contains(partition))
          throw new ConflictException(
            s"partition '$partition' was modified by a concurrent commit " +
              s"(versions ${readVersion + 1}..${cur.version}); recompute required")
      }
      val rebased = cur.entries + (partition -> dataDir)
      if (tryCommit(root, cur.version + 1, rebased)) return cur.version + 1
      // lost the CAS — loop re-reads, re-checks conflicts, re-links
    }
    throw new IllegalStateException(
      s"could not commit '$partition' after $maxAttempts attempts")
  }
}
