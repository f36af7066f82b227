package graft.store

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, InputStream, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-JVM Hadoop `FileSystem` with OBJECT-STORE semantics — the test double
  * standing in for `s3a://` (no hadoop-aws jar ships in this zero-egress
  * image). Deliberately mimics how S3A differs from a real filesystem, so a
  * suite running over it proves the store layer survives object stores, not
  * just POSIX:
  *
  *   - flat key namespace; "directories" exist only as key prefixes plus
  *     explicit zero-byte `key/` markers (what S3A writes on mkdirs);
  *   - writes are PUT-on-close: bytes become visible atomically when the
  *     stream closes, never partially;
  *   - rename is per-key copy-then-delete — NON-atomic, exactly the S3 copy
  *     semantics the commit-marker protocol has to tolerate;
  *   - append is unsupported (IOException, as on S3A);
  *   - listing is list-by-prefix with synthesized directory entries.
  *
  * Backing state is a JVM-global map so every `FileSystem.get` (driver and
  * the 4 local executor threads share the cached instance) sees one store.
  */
object MockObjectStore {
  /** bucket → key → (bytes, mtime) */
  private val buckets =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, (Array[Byte], Long)]]()
  def bucket(name: String): ConcurrentHashMap[String, (Array[Byte], Long)] =
    buckets.computeIfAbsent(name, _ => new ConcurrentHashMap())
  def clear(): Unit = buckets.clear()
}

class MockObjectStoreFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    workDir = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "mock3a"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  private def store = MockObjectStore.bucket(fsUri.getAuthority)

  /** Object key for a path: no leading/trailing slash; "" is the root. */
  private def keyOf(p: Path): String =
    makeQualified(p).toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def qualify(key: String): Path =
    new Path(s"$fsUri/$key")

  private def isFile(key: String): Boolean = key.nonEmpty && store.containsKey(key)

  private def isDir(key: String): Boolean = {
    if (key.isEmpty) return true // the bucket root always exists
    val prefix = key + "/"
    store.containsKey(prefix) ||
      store.keySet.asScala.exists(_.startsWith(prefix))
  }

  private def fileStatus(key: String): FileStatus = {
    val (bytes, mtime) = store.get(key)
    new FileStatus(bytes.length.toLong, false, 1, 32L * 1024 * 1024, mtime,
      qualify(key))
  }

  private def dirStatus(key: String): FileStatus =
    new FileStatus(0L, true, 1, 32L * 1024 * 1024, 0L,
      if (key.isEmpty) new Path(fsUri.toString + "/") else qualify(key))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (isFile(key)) fileStatus(key)
    else if (isDir(key)) dirStatus(key)
    else throw new FileNotFoundException(s"No such object: $f")
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (isFile(key)) return Array(fileStatus(key))
    if (!isDir(key)) throw new FileNotFoundException(s"No such object: $f")
    val prefix = if (key.isEmpty) "" else key + "/"
    // one level down: file keys directly under the prefix, plus synthesized
    // directory entries for deeper keys and explicit markers
    val children = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    store.keySet.asScala.toSeq.sorted.foreach { k =>
      if (k.startsWith(prefix) && k.length > prefix.length) {
        val rest = k.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) children.getOrElseUpdate(prefix + rest, false)
        else children.put(prefix + rest.substring(0, slash), true)
      }
    }
    children.map { case (k, dir) => if (dir) dirStatus(k) else fileStatus(k) }.toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    if (!isFile(key)) throw new FileNotFoundException(s"No such object: $f")
    new FSDataInputStream(new SeekableBytes(store.get(key)._1))
  }

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (key.isEmpty || isDir(key))
      throw new FileAlreadyExistsException(s"$f is a directory")
    if (!overwrite && isFile(key))
      throw new FileAlreadyExistsException(s"$f already exists")
    // PUT-on-close: nothing is visible until the stream closes
    val buf = new ByteArrayOutputStream()
    val put: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit =
        store.put(key, (buf.toByteArray, System.currentTimeMillis()))
    }
    new FSDataOutputStream(put, null)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new IOException("append is not supported by the object store")

  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    var dstKey = keyOf(dst)
    // Hadoop semantics: renaming INTO an existing directory nests under it
    if (isDir(dstKey)) dstKey = if (dstKey.isEmpty) src.getName else s"$dstKey/${src.getName}"
    if (isFile(srcKey)) {
      store.put(dstKey, store.get(srcKey))
      store.remove(srcKey)
      true
    } else if (isDir(srcKey)) {
      // per-key copy + delete: the non-atomic S3 "rename"
      val prefix = srcKey + "/"
      val keys = store.keySet.asScala.filter(_.startsWith(prefix)).toSeq
      keys.foreach { k =>
        store.put(dstKey + "/" + k.substring(prefix.length), store.get(k))
        store.remove(k)
      }
      keys.nonEmpty || { store.put(dstKey + "/", (Array.emptyByteArray, 0L)); true }
    } else false
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    if (isFile(key)) { store.remove(key); true }
    else if (isDir(key)) {
      val prefix = if (key.isEmpty) "" else key + "/"
      val keys = store.keySet.asScala.filter(k => k.startsWith(prefix)).toSeq
      if (!recursive && keys.exists(k => k != prefix))
        throw new IOException(s"Directory $f is not empty")
      keys.foreach(store.remove)
      true
    } else false
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    // zero-byte directory markers, like S3A — ancestors implied by prefix
    val key = keyOf(f)
    if (isFile(key)) throw new FileAlreadyExistsException(s"$f exists as a file")
    if (key.nonEmpty) store.putIfAbsent(key + "/", (Array.emptyByteArray, 0L))
    true
  }
}

/** Seekable positioned-readable view over an immutable byte array — what
  * parquet footer reads and zarr shard-index ranged reads need. */
private class SeekableBytes(bytes: Array[Byte])
    extends InputStream with Seekable with PositionedReadable {
  private var pos = 0

  override def read(): Int =
    if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }

  override def seek(newPos: Long): Unit = {
    if (newPos < 0 || newPos > bytes.length)
      throw new IOException(s"seek $newPos out of range 0..${bytes.length}")
    pos = newPos.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (position + length > bytes.length)
      throw new IOException("readFully past end of object")
    System.arraycopy(bytes, position.toInt, buffer, offset, length)
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
