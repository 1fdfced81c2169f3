package graft.sources

/** Storage-class interface for the artifact METADATA plane — the
  * counterpart of [[LeaseBackend]] (which arbitrates lease MUTATIONS) for
  * everything else the store lifecycle touches outside the parquet data
  * files themselves:
  *
  *   - pointer files (`<name>.CURRENT` — [[Versioned.readPointer]] /
  *     [[Versioned.publish]]'s atomic flip),
  *   - completeness markers (the stores' top-level `_SUCCESS`),
  *   - small sidecars written whole (`qerr.BASELINE`),
  *   - directory listings (version GC, `partFileCount`, the
  *     [[RowCountCache]] freshness fingerprint),
  *   - recursive removal (version GC, legacy-layout retirement).
  *
  * Before round 10 these were raw `java.io.File` calls, which silently
  * answer "absent"/"empty" for every `hdfs://`/`s3a://` URI — on remote
  * storage a pointer read would claim no version was ever published and a
  * GC listing would see nothing to collect. Routing them through ONE
  * interface makes the storage-class requirement explicit and swappable:
  *
  *   - [[PosixMetaBackend]] (default): local-disk/NFS semantics via
  *     `java.nio`; the atomic pointer flip is tmp + `ATOMIC_MOVE`.
  *   - [[HadoopMetaBackend]]: any Hadoop `FileSystem` (hdfs://, file:,
  *     s3a:// via S3AFileSystem); the pointer flip uses
  *     `FileContext.rename(OVERWRITE)` — atomic on HDFS-class stores.
  *   - Native object stores (design): pointer flip = ONE overwrite PUT
  *     (atomic per object — no rename needed because the pointer is a
  *     single whole object), marker = PUT of an empty object, list = LIST
  *     with prefix, recursive delete = batch DELETE. Every primitive here
  *     was chosen to be one object-store request; none requires rename,
  *     append, or locking. Leases stay on [[LeaseBackend]]'s conditional
  *     writes — the meta plane deliberately needs NO compare-and-swap
  *     because all its writers already run under the writer lease.
  *
  * Consistency contract: `readString`/`exists`/`list` must observe a
  * completed `writeAtomic`/`createMarker`/`deleteRecursively` (read-after-
  * write, which S3 has provided since 2020 and HDFS always has).
  * `writeAtomic` must never expose torn content to a concurrent reader.
  *
  * Out of scope, deliberately: [[PhysicalLayout]]'s fixture caches (local
  * derived copies of the test fixtures — driver-local by construction)
  * and checkpoint/temp scratch. The parquet data plane itself goes
  * through Spark's own Hadoop integration already.
  */
trait MetaBackend {

  /** Whole content of a small metadata object, or None when ABSENT.
    * Absence is the ONLY condition mapped to None: an IO failure must
    * THROW, never read as absence — Versioned.publish derives the next
    * version number from readPointer, so a transient read error silently
    * reported as "never published" would restart the version chain at v1
    * and permanently defeat GC (every orphan would sort above the cutoff).
    */
  def readString(path: String): Option[String]

  /** Publish `content` at `path` atomically: a concurrent reader sees the
    * old content or the new, never torn bytes, and the new content is
    * complete once this returns. Writers are already serialized by the
    * writer lease — this needs atomicity, not arbitration.
    */
  def writeAtomic(path: String, content: String): Unit

  /** Ensure an empty completeness marker exists at `path` (idempotent —
    * a marker already present is success, matching "another process
    * completed the same build first").
    */
  def createMarker(path: String): Unit

  def exists(path: String): Boolean

  /** Immediate children of `dir` (empty when absent). */
  def list(dir: String): Seq[MetaBackend.Entry]

  /** Remove `path` and everything under it (no-op when absent). */
  def deleteRecursively(path: String): Unit
}

object MetaBackend {
  /** One child in a [[MetaBackend.list]]: leaf name (no parent path),
    * size in bytes (listing-reported; only ever used inside freshness
    * fingerprints, never interpreted), directory flag.
    */
  final case class Entry(name: String, size: Long, isDir: Boolean)
}

/** Default backend: local-disk/NFS via `java.nio` — byte-for-byte the
  * semantics the metadata plane had when it was raw `java.io.File` calls.
  */
object PosixMetaBackend extends MetaBackend {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  /** LOUD misconfiguration guard: a `hdfs://`/`s3a://`/`mem://` URI
    * reaching the POSIX backend means a remote deployment forgot to swap
    * [[Versioned.metaBackend]]. `Paths.get` would map the URI to a
    * nonexistent local relative path and every read would answer "absent"
    * — exactly the silent never-published/restart-at-v1/defeat-GC failure
    * the [[MetaBackend]] trait contract forbids. Throw instead.
    */
  private def local(path: String): java.nio.file.Path = {
    require(!path.contains("://"),
      s"PosixMetaBackend got URI path $path: swap Versioned.metaBackend " +
        "for a remote backend (HadoopMetaBackend / object-store) — the " +
        "POSIX backend would silently read every remote pointer as absent")
    Paths.get(path)
  }

  override def readString(path: String): Option[String] =
    try Some(Files.readString(local(path)))
    catch { // absence only — IO failures propagate (see the trait contract)
      case _: java.nio.file.NoSuchFileException => None
      case _: java.io.FileNotFoundException => None
    }

  override def writeAtomic(path: String, content: String): Unit = {
    val target = local(path)
    val tmp = Paths.get(path + s".tmp-${System.nanoTime()}")
    try {
      Files.write(tmp, content.getBytes("UTF-8"))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch { case e: Throwable =>
      // abandoned tmp siblings would pollute list() results (GC listings,
      // freshness fingerprints) — remove ours before rethrowing
      try Files.deleteIfExists(tmp) catch { case _: Exception => () }
      throw e
    }
    ()
  }

  override def createMarker(path: String): Unit = {
    val created = new java.io.File(local(path).toString).createNewFile()
    require(created || Files.exists(Paths.get(path)),
      s"could not create completeness marker $path")
  }

  override def exists(path: String): Boolean =
    Files.exists(local(path))

  override def list(dir: String): Seq[MetaBackend.Entry] =
    Option(new java.io.File(local(dir).toString).listFiles()).getOrElse(Array.empty)
      .map(f => MetaBackend.Entry(f.getName, f.length(), f.isDirectory))
      .toIndexedSeq

  override def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(local(path).toString)
    if (f.exists()) {
      import scala.reflect.io.Directory
      new Directory(f).deleteRecursively()
      ()
    }
  }
}

/** Hadoop `FileSystem`-backed metadata plane: the same primitives over
  * any filesystem Spark can reach (hdfs://, file:, s3a://). The atomic
  * pointer flip goes through `FileContext.rename(OVERWRITE)`, which
  * HDFS-class filesystems implement atomically; on S3AFileSystem the
  * rename is copy+delete, so a NATIVE object-store deployment should use
  * a single-PUT backend per the [[MetaBackend]] scaladoc rather than this
  * one — this class is the hdfs:// port and the interface-conformance
  * proof, not the S3 endpoint.
  */
final class HadoopMetaBackend(conf: org.apache.hadoop.conf.Configuration)
  extends MetaBackend {
  import org.apache.hadoop.fs.{FileContext, Options, Path}

  private def fs(p: Path) = p.getFileSystem(conf)

  override def readString(path: String): Option[String] = {
    val p = new Path(path)
    try {
      val in = fs(p).open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    } catch { // absence only — other IOExceptions propagate (trait contract)
      case _: java.io.FileNotFoundException => None
    }
  }

  override def writeAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + s".tmp-${System.nanoTime()}")
    // create and rename through the SAME FileContext: one API owns the
    // whole tmp→target publication. (Empirically, on file: both the
    // FileSystem and FileContext layers are checksum-backed and both
    // RENAME the `.crc` sidecar along with the data file — each flip
    // overwrites `.<name>.crc` in place, nothing accumulates — so this
    // is a layer-consistency choice, not a checksum fix.)
    val fc = FileContext.getFileContext(p.toUri, conf)
    try {
      val out = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE))
      try out.write(content.getBytes("UTF-8")) finally out.close()
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    } catch { case e: Throwable =>
      // failed write/rename must not leak the tmp sibling into list()
      // consumers (GC listings, freshness fingerprints)
      try fs(tmp).delete(tmp, false) catch { case _: Exception => () }
      throw e
    }
  }

  override def createMarker(path: String): Unit = {
    val p = new Path(path)
    try fs(p).create(p, false).close()
    catch { case _: java.io.IOException => () } // lost the create race
    require(fs(p).exists(p), s"could not create completeness marker $path")
  }

  override def exists(path: String): Boolean = {
    val p = new Path(path)
    fs(p).exists(p)
  }

  override def list(dir: String): Seq[MetaBackend.Entry] = {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(s =>
      MetaBackend.Entry(s.getPath.getName, s.getLen, s.isDirectory)).toIndexedSeq
  }

  override def deleteRecursively(path: String): Unit = {
    val p = new Path(path)
    fs(p).delete(p, true)
    ()
  }
}
