package graft.sources

import java.io.{FileNotFoundException, IOException}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal Hadoop `FileSystem` over a [[MemObjectStore]] bucket
  * (`mem://bucket/key`) — the DATA-plane face of the in-memory object
  * store, so Spark parquet reads/writes and [[ObjectStoreMetaBackend]]
  * share one namespace the way a real `s3a://bucket` deployment's data
  * and metadata do. Register with
  * `conf.set("fs.mem.impl", classOf[MemFileSystem].getName)`.
  *
  * Covers exactly what a committer-driven parquet write and a footer-
  * seeking parquet read need: create/open (seekable), getFileStatus,
  * listStatus, mkdirs, rename, delete. `rename` follows HDFS semantics
  * (into an existing directory target; false on conflicts) because the
  * DATA plane's committers rename — the META backend never does, which is
  * the whole point of the split. `append` throws: object stores don't.
  *
  * Single-JVM by construction (a conformance/drill filesystem, like the
  * in-memory lease backend): `local[*]` executors share the static bucket
  * registry; a multi-host cluster needs a real object store.
  */
final class MemFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"mem://${uri.getAuthority}")
    workDir = new Path(s"mem://${uri.getAuthority}/")
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getScheme: String = "mem"

  private def bucketOf(f: Path): MemObjectStore.Bucket = {
    val auth = Option(f.toUri.getAuthority).getOrElse(fsUri.getAuthority)
    MemObjectStore.bucket(auth)
  }
  private def keyOf(f: Path): String =
    bucketOf(f).norm(Option(f.toUri.getPath).getOrElse(""))
  private def qualify(f: Path): Path = f.makeQualified(fsUri, workDir)

  override def getFileStatus(f: Path): FileStatus = {
    val b = bucketOf(f); val k = keyOf(f)
    b.get(k) match {
      case Some(bytes) =>
        new FileStatus(bytes.length.toLong, false, 1, 64L * 1024 * 1024,
          b.mtime(k), qualify(f))
      case None if b.isDir(k) =>
        new FileStatus(0L, true, 1, 64L * 1024 * 1024, 0L, qualify(f))
      case None => throw new FileNotFoundException(s"mem object not found: $f")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val b = bucketOf(f); val k = keyOf(f)
    if (b.objects.containsKey(k)) Array(getFileStatus(f))
    else if (!b.isDir(k)) throw new FileNotFoundException(s"mem dir not found: $f")
    else b.list(k).map { case (name, size, isDir) =>
      new FileStatus(size, isDir, 1, 64L * 1024 * 1024,
        if (isDir) 0L else b.mtime(if (k.isEmpty) name else s"$k/$name"),
        qualify(new Path(f, name)))
    }.toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = bucketOf(f).get(keyOf(f)).getOrElse(
      throw new FileNotFoundException(s"mem object not found: $f"))
    new FSDataInputStream(new MemFileSystem.MemInput(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val b = bucketOf(f); val k = keyOf(f)
    if (!overwrite && b.objects.containsKey(k))
      throw new FileAlreadyExistsException(s"mem object exists: $f")
    if (b.isDir(k)) throw new IOException(s"cannot create over mem dir: $f")
    val buf = new java.io.ByteArrayOutputStream() {
      override def close(): Unit = { super.close(); b.put(k, toByteArray) }
    }
    new FSDataOutputStream(buf, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "object stores do not append; MemFileSystem mirrors that")

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val b = bucketOf(f); val k = keyOf(f)
    if (b.objects.containsKey(k))
      throw new FileAlreadyExistsException(s"mem object exists at dir path: $f")
    b.mkdir(k); true
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val b = bucketOf(src)
    val sk = keyOf(src)
    if (!b.exists(sk)) return false
    val dk0 = keyOf(dst)
    // HDFS semantics: renaming INTO an existing directory appends the
    // source's leaf name; any other existing destination is a conflict
    val dk = if (b.isDir(dk0)) b.norm(s"$dk0/${src.getName}") else dk0
    if (sk == dk) return true
    if (b.exists(dk)) return false
    if (b.objects.containsKey(sk)) {
      val v = b.objects.remove(sk)
      if (v == null) return false
      b.objects.put(dk, v)
    } else {
      val sp = sk + "/"
      // snapshot then move — single-writer per subtree (committer contract)
      val keys = scala.collection.mutable.ArrayBuffer.empty[String]
      b.objects.forEach((k, _) => if (k.startsWith(sp)) keys += k)
      keys.foreach { k =>
        val v = b.objects.remove(k)
        if (v != null) b.objects.put(dk + "/" + k.substring(sp.length), v)
      }
      val markers = scala.collection.mutable.ArrayBuffer.empty[String]
      b.dirMarkers.forEach(m =>
        if (m == sk || m.startsWith(sp)) markers += m)
      markers.foreach { m =>
        b.dirMarkers.remove(m)
        b.dirMarkers.add(
          if (m == sk) dk else dk + "/" + m.substring(sp.length))
      }
      b.mkdir(dk)
    }
    b.mkdir(b.parentOf(dk))
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val b = bucketOf(f); val k = keyOf(f)
    if (!b.exists(k)) return false
    if (b.isDir(k) && !recursive && b.list(k).nonEmpty)
      throw new IOException(s"mem dir not empty (non-recursive delete): $f")
    b.deletePrefix(k)
    true
  }
}

object MemFileSystem {
  /** Seekable, positioned-readable byte-array stream (parquet footers
    * seek from the end).
    */
  private final class MemInput(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0

    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length)
        throw new java.io.EOFException(s"seek $p outside [0, ${bytes.length}]")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val v = bytes(pos) & 0xff; pos += 1; v }

    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0 // InputStream contract: zero-length read is 0, even at EOF
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, buf, off, n)
      pos += n
      n
    }

    override def available(): Int = bytes.length - pos
  }
}
