package graft.sources

/** Storage arbitration primitives for the writer-lease protocol
  * ([[Versioned.withWriterLease]]). The protocol needs exactly three
  * mutations beyond read — create-if-absent, replace-if-content
  * (compare-and-swap), delete-if-content — expressed as an interface so
  * each storage class implements them with ITS native arbitration
  * primitive:
  *
  *   - [[PosixLeaseBackend]] (default): POSIX-semantics filesystems
  *     (local disk, HDFS-compatible mounts, NFSv4). CAS is realized by
  *     serializing every lease mutation under an exclusive
  *     [[java.nio.channels.FileLock]] on a sibling `.LOCK` file — the
  *     lock is OS-scoped (released automatically when a crashed holder's
  *     process dies) and held only for the microseconds of one
  *     read-compare-write. This replaces the previous
  *     read-then-ATOMIC_MOVE dance, whose compare and write were two
  *     separate steps: a holder stalled between them could land its
  *     renewal on top of a successor's fresh lease, leaving TWO writers
  *     each believing they held exclusivity.
  *   - S3-class object stores (design; no rename, no file locks — but
  *     conditional writes are NATIVE): `If-None-Match: *` PUT implements
  *     [[LeaseBackend.createIfAbsent]], `If-Match: <etag>` PUT implements
  *     [[LeaseBackend.replaceIfContent]] (read the object + ETag, PUT the
  *     new content conditional on that ETag), `If-Match: <etag>` DELETE
  *     implements [[LeaseBackend.deleteIfContent]]. Each primitive is one
  *     conditional request and needs no lock object at all; the interface
  *     is deliberately the exact shape of that API so the port is
  *     mechanical. Documented in SCALE.md (object-store leases).
  *
  * All methods must be linearizable per `path` against the other methods
  * of the same backend instance — that is the whole contract; the lease
  * protocol's correctness argument reduces to it.
  */
trait LeaseBackend {

  /** Raw lease content, or None when absent. Never throws on absence. */
  def read(path: String): Option[String]

  /** Age of the lease object in ms (now − mtime; may be NEGATIVE under
    * cross-host clock skew), or None when absent. Judgment input for
    * torn/unparseable content only.
    */
  def ageMs(path: String): Option[Long]

  /** Atomically create with `content` iff absent. True = we own it. */
  def createIfAbsent(path: String, content: String): Boolean

  /** Atomically replace with `next` iff current content == `expected`.
    * True = replaced (we own the new incarnation); false = the content
    * changed or vanished first — the caller lost the race and must treat
    * the lease as lost.
    */
  def replaceIfContent(path: String, expected: String, next: String): Boolean

  /** Atomically delete iff current content == `expected`; false when the
    * content changed or vanished first (a successor's lease is never
    * deleted).
    */
  def deleteIfContent(path: String, expected: String): Boolean
}

/** Default backend: POSIX filesystems. Every mutation (and the reads the
  * protocol judges on) runs under an exclusive OS file lock on
  * `<path>.LOCK`, making read-compare-write atomic across processes. The
  * lock file itself is never deleted (deleting it would reintroduce the
  * unlock/recreate race); it is one empty file per artifact.
  */
object PosixLeaseBackend extends LeaseBackend {
  import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

  /** How long a mutation waits for the arbitration lock before declaring
    * the storage pathological. Healthy critical sections are microseconds;
    * 2 s tolerates heavy IO contention without masking a hung foreign
    * process forever.
    */
  private val LockWaitMs = 2000L

  private def withFileLock[T](path: String)(body: => T): T = {
    // LOUD misconfiguration guard (mirrors PosixMetaBackend.local): a URI
    // lease path reaching the POSIX backend means a remote deployment
    // forgot to swap Versioned.leaseBackend — RandomAccessFile would fail
    // incidentally (or worse, lock a meaningless local relative path)
    require(!path.contains("://"),
      s"PosixLeaseBackend got URI path $path: swap Versioned.leaseBackend " +
        "for a remote backend (S3 conditional-put class) — POSIX file " +
        "locks cannot arbitrate an object-store lease")
    val raf = new java.io.RandomAccessFile(path + ".LOCK", "rw")
    try {
      val ch = raf.getChannel
      var lock: java.nio.channels.FileLock = null
      val deadline = System.currentTimeMillis() + LockWaitMs
      while (lock == null) {
        lock =
          try ch.tryLock()
          catch { // same-JVM overlap (shouldn't occur: in-process callers
                  // are serialized upstream) is just "busy", not fatal
            case _: java.nio.channels.OverlappingFileLockException => null
          }
        if (lock == null) {
          if (System.currentTimeMillis() > deadline)
            throw new Versioned.ConcurrentWriterException(
              s"lease arbitration lock $path.LOCK held for > ${LockWaitMs} ms " +
                "— another writer's lease mutation is hung")
          Thread.sleep(10)
        }
      }
      try body finally lock.release()
    } finally raf.close()
  }

  override def read(path: String): Option[String] =
    withFileLock(path) {
      try Some(Files.readString(Paths.get(path)))
      catch { case _: Exception => None }
    }

  override def ageMs(path: String): Option[Long] =
    withFileLock(path) {
      try Some(System.currentTimeMillis() -
        Files.getLastModifiedTime(Paths.get(path)).toMillis)
      catch { case _: Exception => None }
    }

  override def createIfAbsent(path: String, content: String): Boolean =
    withFileLock(path) {
      try {
        Files.write(Paths.get(path), content.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }

  override def replaceIfContent(path: String, expected: String, next: String): Boolean =
    withFileLock(path) {
      val cur = try Files.readString(Paths.get(path))
                catch { case _: Exception => null }
      if (cur != expected) false
      else {
        // tmp + ATOMIC_MOVE so an unlocked observer never sees torn content
        val tmp = Paths.get(path + s".tmp-${System.nanoTime()}")
        Files.write(tmp, next.getBytes("UTF-8"))
        Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        true
      }
    }

  override def deleteIfContent(path: String, expected: String): Boolean =
    withFileLock(path) {
      val cur = try Files.readString(Paths.get(path))
                catch { case _: Exception => null }
      if (cur != expected) false
      else { Files.deleteIfExists(Paths.get(path)); true }
    }
}

/** In-memory linearizable backend — the executable reference
  * implementation of the [[LeaseBackend]] contract and a faithful
  * simulation of the documented S3 conditional-request mapping: every
  * object carries an ETag; [[createIfAbsent]] is `If-None-Match: *`;
  * [[replaceIfContent]] reads the object + ETag and writes conditional on
  * that exact ETag (`If-Match`); [[deleteIfContent]] is the conditional
  * DELETE. The protocol drills (VersionedSpec) run the full
  * acquire/renew/takeover/release matrix against BOTH this and the POSIX
  * backend, so any protocol step that silently assumed POSIX semantics
  * fails the suite, not production. An object-store port replaces the map
  * operations with the corresponding conditional requests 1:1.
  */
final class InMemoryCasLeaseBackend extends LeaseBackend {
  private final case class Obj(content: String, etag: Long, mtime: Long)
  private val etags = new java.util.concurrent.atomic.AtomicLong
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Obj]

  override def read(path: String): Option[String] =
    Option(m.get(path)).map(_.content)

  override def ageMs(path: String): Option[Long] =
    Option(m.get(path)).map(o => System.currentTimeMillis() - o.mtime)

  override def createIfAbsent(path: String, content: String): Boolean =
    m.putIfAbsent(path,
      Obj(content, etags.incrementAndGet(), System.currentTimeMillis())) == null

  override def replaceIfContent(path: String, expected: String, next: String): Boolean = {
    // read object + ETag, one write conditional on that exact ETag — the
    // S3 recipe; a lost ETag race re-reads only to re-judge the CONTENT
    // (which may now differ → lost), never to force the write through
    while (true) {
      val cur = m.get(path)
      if (cur == null || cur.content != expected) return false
      if (m.replace(path, cur,
          Obj(next, etags.incrementAndGet(), System.currentTimeMillis())))
        return true
    }
    false
  }

  override def deleteIfContent(path: String, expected: String): Boolean = {
    while (true) {
      val cur = m.get(path)
      if (cur == null || cur.content != expected) return false
      if (m.remove(path, cur)) return true
    }
    false
  }

  /** Drill support: backdate (or forward-date) an object's mtime to stage
    * the age-judgment scenarios (crash garbage vs cross-host clock skew).
    */
  private[sources] def setMtime(path: String, epochMs: Long): Unit = {
    val cur = m.get(path)
    if (cur != null) { m.replace(path, cur, cur.copy(mtime = epochMs)); () }
  }
}
