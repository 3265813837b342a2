package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, BufferedReader,
  BufferedWriter, InputStream, InputStreamReader, OutputStream,
  OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path}

/** Cluster-filesystem I/O layer shared by every trajectory source.
  *
  * The reference inherits mdtraj's local-file readers (its `load`
  * ultimately hands a LOCAL filename to each parser —
  * core/dask_traj.py:59-84), which caps it at single-machine storage.
  * At the 100 TB design point the trajectory shards live on a cluster
  * filesystem (HDFS, S3, GCS, ...), so every open / list / glob /
  * positioned-read / write in `sources/` goes through this one
  * abstraction over `org.apache.hadoop.fs.FileSystem` instead of
  * `java.io.File` / `RandomAccessFile`:
  *
  *  - `load("hdfs://nn/traj/part-&#42;.dcd")`, `load("s3a://bucket/run42/")`
  *    resolve through the scheme's registered FileSystem;
  *  - plain local paths (`/tmp/foo.xyz`) keep working — they resolve to
  *    the default (local) filesystem exactly as before;
  *  - positioned binary reads keep their exact contract:
  *    `FSDataInputStream` is seekable, so the byte-offset partition
  *    planning (DCD frame strides, TRR header index, dtr arithmetic
  *    offsets) is unchanged;
  *  - `FileSystem.globStatus` serves the trailing-segment globs that
  *    `MultiPath` exposes, on ANY scheme.
  *
  * Configuration: on the driver (and in local mode) the active
  * SparkSession's Hadoop configuration is used, so `spark.hadoop.*`
  * settings (S3 credentials, custom schemes) apply. On a cluster
  * executor with no session in the JVM, the configuration is rebuilt
  * from the executor's `SparkEnv.conf` — every `spark.hadoop.*` entry
  * the driver set (S3 credentials, endpoint overrides, custom FS
  * impls) is applied on top of the classpath's core-site.xml, so
  * partition readers and data writers see the same filesystems the
  * driver planned against. (`FsIOSpec` pins this with a marker key
  * read from inside an executor task with both sessions cleared.)
  *
  * Checksum policy: Hadoop's LocalFileSystem wraps the raw local FS in
  * a ChecksumFileSystem that writes a hidden `.name.crc` sidecar per
  * file and fails reads with a ChecksumException when the sidecar goes
  * stale. The trajectory formats carry their own record markers (DCD
  * validates per-frame block lengths, dtr checks its metadata magic),
  * so the sidecars add no safety — but they doubled the file count of
  * every DSv2 write directory and turned any out-of-band edit into an
  * opaque checksum error instead of the source's own error contract.
  * Both sides are therefore explicitly disabled on checksum-wrapping
  * filesystems; HDFS/S3A have integrity built into the store and are
  * unaffected.
  *
  * The policy is SCOPED to FsIO: instances come from
  * `FileSystem.newInstance` and live in an FsIO-private cache, so the
  * JVM-shared instance that `FileSystem.get` / `Path.getFileSystem`
  * hands to everyone else (Spark's committers, event logs, streaming
  * checkpoint metadata, user code embedding this library) keeps full
  * CRC writing and verification. (`FsIOSpec` pins both sides: the
  * shared local FS still writes sidecars and throws ChecksumException
  * on a stale one, while FsIO handles do neither.)
  *
  * Rename (used by the dtr frameset committer) maps to
  * `FileSystem.rename`: atomic on HDFS and local disk; on object
  * stores it degrades to copy+delete, the same tradeoff every
  * Hadoop output committer makes.
  */
object FsIO {

  /** Classpath-only conf (core-site.xml/hdfs-site.xml), built once —
    * the base both fallback paths layer on. */
  private lazy val standalone = new Configuration()

  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(executorConf)

  /** Session-less JVMs/threads — i.e. cluster executors, where
    * partition readers and data writers actually run. Rebuilt per call
    * (cheap: the copy constructor skips XML re-parse); SparkEnv
    * carries the driver's SparkConf to every executor, which is how
    * the driver's S3 credentials / endpoints / custom schemes reach
    * `FsRandom` without threading a SerializableConfiguration through
    * each of the thirteen sources. Note the visibility boundary: the
    * rebuilt conf only reaches FileSystem INSTANTIATION — a scheme's
    * instance is created once per JVM ([[fs]] caches it, exactly as
    * Hadoop's own `FileSystem.get` cache would), so `spark.hadoop.*`
    * changes made after a scheme's first access (credential rotation)
    * require [[invalidate]] to take effect. */
  private def executorConf: Configuration =
    Option(org.apache.spark.SparkEnv.get) match {
      case None => standalone
      case Some(env) =>
        val c = new Configuration(standalone)
        env.conf.getAll.foreach { case (k, v) =>
          if (k.startsWith("spark.hadoop."))
            c.set(k.substring("spark.hadoop.".length), v)
        }
        c
    }

  /** FsIO-private FileSystem instances, one per scheme://authority.
    * `FileSystem.newInstance` bypasses Hadoop's shared cache, so the
    * checksum policy below mutates only instances this library owns —
    * `FileSystem.get` callers elsewhere in the JVM are untouched. */
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  /** Drop all cached FsIO FileSystem instances, so the next [[fs]]
    * call re-instantiates from the CURRENT configuration — the hook
    * for runtime `spark.hadoop.*` changes (credential/endpoint
    * rotation), which otherwise never reach an already-created
    * instance. Dropped instances are not closed (in-flight streams on
    * them stay valid); they are reclaimed when unreferenced.
    *
    * Best-effort only: [[fs]] snapshots the configuration before its
    * `computeIfAbsent`, so a concurrent in-flight `fs()` call can
    * repopulate the cache with an instance built from the
    * pre-rotation configuration — after changing `spark.hadoop.*`
    * keys, callers that need a hard guarantee should quiesce reads or
    * call `invalidate()` a second time once in-flight calls drain. */
  def invalidate(): Unit = instances.clear()

  /** FileSystem for a path's scheme — an FsIO-private instance (one
    * per scheme://authority, created on first use) with the explicit
    * local-checksum policy applied (see object scaladoc). */
  def fs(p: String): FileSystem = {
    val c = conf
    val u = new Path(p).toUri
    val eff = if (u.getScheme == null) FileSystem.getDefaultUri(c) else u
    val key = eff.getScheme + "://" +
      Option(eff.getAuthority).getOrElse("")
    instances.computeIfAbsent(key, _ => {
      val f = FileSystem.newInstance(eff, c)
      f match {
        case cs: ChecksumFileSystem =>
          cs.setWriteChecksum(false)
          cs.setVerifyChecksum(false)
        case _ => ()
      }
      f
    })
  }

  /** Scheme-preserving path join (the `new File(dir, name)` analog):
    * child("hdfs://nn/a", "b") == "hdfs://nn/a/b". */
  def child(dir: String, name: String): String =
    new Path(dir, name).toString

  /** Parent directory of a path, scheme preserved; "" for a bare
    * file name with no parent. */
  def parent(p: String): String =
    Option(new Path(p).getParent).map(_.toString).getOrElse("")

  def fileName(p: String): String = new Path(p).getName

  /** True when the path is absolute WITHIN its filesystem (a leading
    * slash or an explicit scheme) — the `File.isAbsolute` analog used
    * to resolve relative entries in dtr .stk files. */
  def isAbsolute(p: String): Boolean = {
    val hp = new Path(p)
    hp.isAbsolute || hp.toUri.getScheme != null
  }

  // ---- metadata / listing ------------------------------------------------

  def exists(p: String): Boolean = fs(p).exists(new Path(p))

  def isFile(p: String): Boolean = {
    val f = fs(p); val hp = new Path(p)
    f.exists(hp) && f.getFileStatus(hp).isFile
  }

  def isDirectory(p: String): Boolean = {
    val f = fs(p); val hp = new Path(p)
    f.exists(hp) && f.getFileStatus(hp).isDirectory
  }

  def length(p: String): Long = fs(p).getFileStatus(new Path(p)).getLen

  /** (length, modification time) — the frame-index sidecar's
    * invalidation pair (FrameIndexCache). */
  def statFile(p: String): (Long, Long) = {
    val st = fs(p).getFileStatus(new Path(p))
    (st.getLen, st.getModificationTime)
  }

  /** One listed entry; `path` keeps the scheme of the listed dir. */
  final case class Entry(name: String, path: String, isFile: Boolean,
      len: Long)

  /** Non-recursive listing, name order (the order that assigns
    * globally contiguous frame ids across shards). */
  def list(dir: String): Seq[Entry] =
    fs(dir).listStatus(new Path(dir)).toSeq.map { st =>
      Entry(st.getPath.getName, st.getPath.toString, st.isFile, st.getLen)
    }.sortBy(_.name)

  /** Files in `dir` whose NAME matches the glob `namePat`, name order.
    * Hadoop glob semantics (`* ? [] {}`) — a superset of the Java NIO
    * matcher the local implementation used, identical on the patterns
    * the sources document (trailing-segment `part-*.xyz` style). */
  def globFiles(dir: String, namePat: String): Seq[String] =
    fs(dir).globStatus(new Path(dir, namePat)) match {
      case null => Nil
      case sts => sts.toSeq.filter(_.isFile)
        .map(_.getPath).sortBy(_.getName).map(_.toString)
    }

  /** Directories in `dir` whose NAME matches the glob, name order —
    * the frameset-directory symmetric of [[globFiles]], so every
    * format (file- and directory-shaped) shares ONE glob dialect
    * (Hadoop's). */
  def globDirs(dir: String, namePat: String): Seq[String] =
    fs(dir).globStatus(new Path(dir, namePat)) match {
      case null => Nil
      case sts => sts.toSeq.filterNot(_.isFile)
        .map(_.getPath).sortBy(_.getName).map(_.toString)
    }

  // ---- reads -------------------------------------------------------------

  /** Buffered sequential read stream. */
  def openStream(p: String): InputStream =
    new BufferedInputStream(fs(p).open(new Path(p)), 1 << 16)

  /** Positioned-reader open counter — lets the frame-index sidecar
    * spec assert "a second load of the same path plans with ZERO
    * header walks" as a hard number instead of a timing heuristic. */
  private val randomOpenCounter =
    new java.util.concurrent.atomic.AtomicLong()

  def randomOpens: Long = randomOpenCounter.get()

  /** Seekable positioned reader — the RandomAccessFile("r") analog. */
  def openRandom(p: String): FsRandom = {
    randomOpenCounter.incrementAndGet()
    new FsRandom(p)
  }

  /** Whole-file read for small metadata files (dtr `metadata`, .stk
    * lists, topology headers) — NOT for trajectory payloads, which are
    * read positioned per partition. */
  def readAllBytes(p: String): Array[Byte] = {
    val st = fs(p).getFileStatus(new Path(p))
    require(st.getLen <= Int.MaxValue,
      s"readAllBytes is for small metadata files; $p is ${st.getLen} " +
        "bytes (> 2 GiB) — use openRandom/openStream for payloads")
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs(p).open(new Path(p))
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  def readLines(p: String): Seq[String] = {
    val r = new BufferedReader(
      new InputStreamReader(openStream(p), StandardCharsets.UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).toVector
    finally r.close()
  }

  // ---- writes ------------------------------------------------------------

  def mkdirs(p: String): Unit = fs(p).mkdirs(new Path(p))

  def delete(p: String, recursive: Boolean = false): Boolean =
    fs(p).delete(new Path(p), recursive)

  /** Buffered byte sink, overwrites. */
  def createStream(p: String): OutputStream =
    new BufferedOutputStream(fs(p).create(new Path(p), true), 1 << 16)

  /** Buffered text sink, overwrites (the BufferedWriter(FileWriter)
    * analog; UTF-8, which all the text formats are). */
  def createWriter(p: String): BufferedWriter =
    new BufferedWriter(
      new OutputStreamWriter(fs(p).create(new Path(p), true),
        StandardCharsets.UTF_8))

  def writeBytes(p: String, bytes: Array[Byte]): Unit = {
    val out = fs(p).create(new Path(p), true)
    try out.write(bytes) finally out.close()
  }

  def writeString(p: String, s: String): Unit =
    writeBytes(p, s.getBytes(StandardCharsets.UTF_8))

  /** Directory/file move for the commit step (atomic on HDFS/local;
    * copy+delete on object stores — the standard committer tradeoff).
    * Fails loudly instead of returning Hadoop's false. */
  def rename(src: String, dst: String): Unit = {
    val f = fs(src)
    if (!f.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }
}

/** Positioned binary reader with the exact RandomAccessFile("r")
  * surface the binary sources use (seek / readFully / length /
  * getFilePointer / close), backed by a seekable
  * `FSDataInputStream` so byte-offset partition plans work on any
  * Hadoop filesystem.
  *
  * `length()` is the size at open time, not a live stat (unlike
  * RandomAccessFile.length()): handles are short-lived (one per
  * partition read / header probe), so a simulation appending frames
  * is observed on the next open, which is the same granularity the
  * chunked planner re-plans at anyway. */
final class FsRandom(p: String) extends AutoCloseable {
  private val fileSystem = FsIO.fs(p)
  private val hp = new Path(p)
  private val len = fileSystem.getFileStatus(hp).getLen
  private val in = fileSystem.open(hp)

  def length(): Long = len
  def seek(pos: Long): Unit = in.seek(pos)
  def getFilePointer: Long = in.getPos
  def readFully(b: Array[Byte]): Unit = in.readFully(b, 0, b.length)
  def readFully(b: Array[Byte], off: Int, lenN: Int): Unit =
    in.readFully(b, off, lenN)
  override def close(): Unit = in.close()
}
