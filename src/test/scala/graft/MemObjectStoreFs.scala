package graft

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-memory Hadoop FileSystem with OBJECT-STORE semantics, registered
  * as `mockobj://bucket/...` — the closest exercisable stand-in for the
  * reference's B2/S3 object store in a jar-less sandbox (no hadoop-aws
  * on the classpath, no network). What it deliberately mimics from S3-
  * family stores, because Sources' multi-scheme paths must survive them:
  *
  *  - a FLAT key space: "directories" exist only as key prefixes (plus
  *    explicit zero-byte markers from mkdirs, like s3a);
  *  - non-atomic rename: copy-then-delete per key, exactly the property
  *    that makes naive rename-based commit protocols unsafe on object
  *    stores;
  *  - per-bucket namespaces keyed by URI authority.
  *
  * Parquet/CSV read+write work end-to-end through it (seekable reads
  * for footers, FileOutputCommitter's temporary-directory dance), so
  * SourcesSpec can drive writeWarehouse/readWarehouse/exists/
  * writeSingleCsv over a non-`file://` scheme for real.
  */
class MemObjectStoreFs extends FileSystem {
  import MemObjectStoreFs._

  private var fsUri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    workDir = new Path(fsUri.toString + "/")
    setConf(conf)
  }

  override def getScheme: String = "mockobj"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** bucket-qualified flat key, no leading slash; "" is the bucket root */
  private def keyOf(p: Path): String = {
    val q = makeQualified(p)
    q.toUri.getAuthority + ":" + q.toUri.getPath.stripPrefix("/")
      .stripSuffix("/")
  }
  private def pathOf(key: String): Path = {
    val i = key.indexOf(':')
    new Path(s"mockobj://${key.substring(0, i)}/${key.substring(i + 1)}")
  }

  private def status(key: String): FileStatus = {
    val bytes = store.get(key)
    if (bytes != null)
      new FileStatus(bytes.length.toLong, false, 1, BlockSize,
        created.getOrDefault(key, 0L), pathOf(key))
    else new FileStatus(0L, true, 1, BlockSize, 0L, pathOf(key))
  }

  private def isImplicitDir(key: String): Boolean = {
    val pfx = key + "/"
    dirMarkers.contains(key) ||
      store.keySet.stream.anyMatch(_.startsWith(pfx)) ||
      dirMarkers.stream.anyMatch(_.startsWith(pfx))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.endsWith(":")) return status(key) // bucket root is a dir
    if (store.containsKey(key)) status(key)
    else if (isImplicitDir(key)) status(key)
    else throw new FileNotFoundException(s"mockobj: no such key $key")
  }

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true } catch {
      case _: FileNotFoundException => false
    }

  override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f)
    if (!st.isDirectory) return Array(st)
    val pfx = keyOf(f) match {
      case k if k.endsWith(":") => k // bucket root: "bucket:"
      case k => k + "/"
    }
    val children = new scala.collection.mutable.TreeSet[String]()
    val fileKeys = new scala.collection.mutable.TreeSet[String]()
    val it = store.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k.startsWith(pfx)) {
        val rest = k.substring(pfx.length)
        val slash = rest.indexOf('/')
        if (slash < 0) fileKeys.add(k)
        else children.add(pfx + rest.substring(0, slash))
      }
    }
    val mt = dirMarkers.iterator()
    while (mt.hasNext) {
      val k = mt.next()
      if (k.startsWith(pfx)) {
        val rest = k.substring(pfx.length)
        val slash = rest.indexOf('/')
        children.add(pfx + (if (slash < 0) rest
                            else rest.substring(0, slash)))
      }
    }
    (fileKeys.toSeq.map(status) ++
      children.diff(fileKeys).toSeq.map(status)).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.get(keyOf(f))
    if (bytes == null)
      throw new FileNotFoundException(s"mockobj: no such key ${keyOf(f)}")
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && store.containsKey(key))
      throw new IOException(s"mockobj: key exists $key")
    if (isImplicitDir(key))
      throw new IOException(s"mockobj: $key is a directory")
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(buf, null) {
      override def close(): Unit = {
        super.close()
        // object-store PUT: the key appears atomically at close
        store.put(key, buf.toByteArray)
        created.put(key, System.currentTimeMillis())
      }
    }
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mockobj: append not supported")

  /** Object-store rename: server-side COPY of every key under the
    * source, then DELETE — visibly non-atomic, like s3a.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    // Hadoop semantics: renaming into an existing directory moves the
    // source UNDER it
    val dstKey0 = keyOf(dst)
    val dstKey =
      if ((store.containsKey(dstKey0) || isImplicitDir(dstKey0)) &&
          isImplicitDir(dstKey0))
        dstKey0 + "/" + src.getName
      else dstKey0
    if (store.containsKey(srcKey)) {
      if (store.containsKey(dstKey)) return false
      store.put(dstKey, store.get(srcKey))
      created.put(dstKey, created.getOrDefault(srcKey, 0L))
      store.remove(srcKey); created.remove(srcKey)
      return true
    }
    if (!isImplicitDir(srcKey)) return false
    val pfx = srcKey + "/"
    val keys = new scala.collection.mutable.ArrayBuffer[String]()
    val it = store.keySet.iterator()
    while (it.hasNext) { val k = it.next(); if (k.startsWith(pfx)) keys += k }
    keys.foreach { k =>
      val nk = dstKey + "/" + k.substring(pfx.length)
      store.put(nk, store.get(k))
      created.put(nk, created.getOrDefault(k, 0L))
      store.remove(k); created.remove(k)
    }
    val mks = new scala.collection.mutable.ArrayBuffer[String]()
    val mt = dirMarkers.iterator()
    while (mt.hasNext) {
      val k = mt.next()
      if (k.startsWith(pfx) || k == srcKey) mks += k
    }
    mks.foreach { k =>
      dirMarkers.remove(k)
      dirMarkers.add(
        if (k == srcKey) dstKey else dstKey + "/" + k.substring(pfx.length))
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    if (store.containsKey(key)) {
      store.remove(key); created.remove(key); return true
    }
    if (!isImplicitDir(key)) return false
    val pfx = key + "/"
    val any = store.keySet.stream.anyMatch(_.startsWith(pfx))
    if (any && !recursive)
      throw new IOException(s"mockobj: $key is a non-empty directory")
    val keys = new scala.collection.mutable.ArrayBuffer[String]()
    val it = store.keySet.iterator()
    while (it.hasNext) { val k = it.next(); if (k.startsWith(pfx)) keys += k }
    keys.foreach { k => store.remove(k); created.remove(k) }
    val mks = new scala.collection.mutable.ArrayBuffer[String]()
    val mt = dirMarkers.iterator()
    while (mt.hasNext) {
      val k = mt.next(); if (k.startsWith(pfx) || k == key) mks += k
    }
    mks.foreach(dirMarkers.remove)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var p = f
    while (p != null && keyOf(p).nonEmpty && !keyOf(p).endsWith(":")) {
      dirMarkers.add(keyOf(p))
      p = p.getParent
    }
    true
  }
}

object MemObjectStoreFs {
  val BlockSize: Long = 32L * 1024 * 1024
  /** "bucket:path" → bytes; static so every FileSystem.get sees one store */
  val store = new ConcurrentHashMap[String, Array[Byte]]()
  val created = new ConcurrentHashMap[String, java.lang.Long]()
  val dirMarkers = ConcurrentHashMap.newKeySet[String]()
  def clear(): Unit = { store.clear(); created.clear(); dirMarkers.clear() }

  private class SeekableBytes(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n)
      pos += n; n
    }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length)
        throw new IOException(s"mockobj: seek $p out of [0, ${bytes.length}]")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
  }
}
