package graft.sources

import java.io.{DataInputStream, DataOutputStream}

/** Persistent + in-session cache for the variable-record frame indexes
  * (VERDICT r19 next #3: the TRR/XTC scaladocs promised "persist this
  * index as a sidecar once per immutable file" as the 100 TB
  * production path, while every plan re-walked each file's headers on
  * the driver — fine at fixture scale, the planning bottleneck at
  * 100 TB of .trr shards).
  *
  * Two layers, both keyed by (format, path, file length, mtime, parse
  * mode) so a changed file can never serve a stale index — the
  * INVALIDATION RULE is the stat pair (length, mtime): any mismatch
  * ignores the cached entry and re-walks (and, for the sidecar,
  * rewrites it):
  *
  *  1. an in-JVM memo (driver-side; one walk per file per session even
  *     with no configuration), and
  *  2. an optional on-disk sidecar directory, `spark.graft.index.dir`:
  *     when set, a COMPLETE walk (ended by EOF, not by a pushed
  *     frame/limit bound) is written once as
  *     `<dir>/<md5(path)>.<fmt>.idx` (tmp + atomic rename, any FsIO
  *     filesystem) and every later plan — including in new JVMs —
  *     reads the sidecar instead of re-walking the headers.
  *     Sidecars are NOT written next to the data files: trajectory
  *     shards commonly live in read-only or curated stores, and a
  *     reader must never need write access to the data it scans.
  *
  * Bounded walks (pushed frame-range / limit bounds stop the header
  * walk early) are served by SLICING a complete cached index — the
  * result is exactly what the bounded walk would have produced. A
  * bounded walk that had to run (nothing cached) is memoized for
  * equal-or-smaller bounds but never written as a sidecar (it does
  * not describe the whole file).
  *
  * Parse mode is part of the key on purpose: under DROPMALFORMED a
  * torn file yields a truncated index, under FAILFAST it throws — a
  * cached DROPMALFORMED index must not silently satisfy a FAILFAST
  * plan. Well-formed files simply cache per mode.
  */
object FrameIndexCache {

  private final case class Key(fmt: String, path: String, len: Long,
      mtime: Long, mode: String)

  private final case class Entry[M](
      frames: IndexedSeq[(Long, Long, M)], complete: Boolean)

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[Key, Entry[_]]()

  /** Test/diagnostic hook: entries currently memoized. */
  def memoSize: Int = memo.size

  /** Test hook: drop the in-JVM memo (forces sidecar/walk paths). */
  def clearMemo(): Unit = memo.clear()

  private val Magic = 0x47464958 // "GFIX"
  private val Version = 1

  private def indexDir: Option[String] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(s => Option(s.conf.get("spark.graft.index.dir", null)))
      .filter(_.nonEmpty)

  private def sidecarPath(dir: String, key: Key): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"$dir/$h.${key.fmt}.idx"
  }

  /** The one entry point: serve `maxFrames` index entries for `path`,
    * walking headers only when neither cache layer can. `walk` is the
    * format's real header walk (called with the bound to honor). */
  def cached[M](fmt: String, path: String, mode: String,
      maxFrames: Long,
      writeMeta: (DataOutputStream, M) => Unit,
      readMeta: DataInputStream => M)
      (walk: Long => IndexedSeq[(Long, Long, M)])
      : IndexedSeq[(Long, Long, M)] = {
    val st = FsIO.statFile(path)
    val key = Key(fmt, path, st._1, st._2, mode)
    val hit = memo.get(key).asInstanceOf[Entry[M]]
    if (hit != null && (hit.complete || hit.frames.length >= maxFrames))
      return slice(hit, maxFrames)
    val dir = indexDir
    dir.flatMap(dd => readSidecar(dd, key, readMeta)) match {
      case Some(e) =>
        memo.put(key, e)
        slice(e, maxFrames)
      case None =>
        val idx = walk(maxFrames)
        // EOF before the bound <=> the walk saw the whole file
        val entry = Entry(idx, complete = idx.length < maxFrames)
        memo.put(key, entry)
        if (entry.complete)
          dir.foreach(dd => writeSidecar(dd, key, entry, writeMeta))
        idx
    }
  }

  private def slice[M](e: Entry[M], maxFrames: Long)
      : IndexedSeq[(Long, Long, M)] =
    if (maxFrames >= e.frames.length) e.frames
    else e.frames.take(maxFrames.toInt)

  private def writeSidecar[M](dir: String, key: Key, e: Entry[M],
      writeMeta: (DataOutputStream, M) => Unit): Unit =
    try {
      FsIO.mkdirs(dir)
      val target = sidecarPath(dir, key)
      val tmp = s"$target.tmp-${java.util.UUID.randomUUID()}"
      val out = new DataOutputStream(FsIO.createStream(tmp))
      try {
        out.writeInt(Magic); out.writeInt(Version)
        out.writeUTF(key.fmt); out.writeUTF(key.path)
        out.writeLong(key.len); out.writeLong(key.mtime)
        out.writeUTF(key.mode)
        out.writeInt(e.frames.length)
        e.frames.foreach { case (off, rows, m) =>
          out.writeLong(off); out.writeLong(rows); writeMeta(out, m)
        }
      } finally out.close()
      if (FsIO.exists(target)) FsIO.delete(target)
      FsIO.rename(tmp, target)
    } catch {
      case e: Exception =>
        // best-effort: an unwritable sidecar dir must never fail a scan
        org.slf4j.LoggerFactory.getLogger("graft.sources.index").warn(
          s"sidecar write failed for ${key.path}: ${e.getMessage}")
    }

  private def readSidecar[M](dir: String, key: Key,
      readMeta: DataInputStream => M): Option[Entry[M]] =
    try {
      val p = sidecarPath(dir, key)
      if (!FsIO.exists(p)) return None
      val in = new DataInputStream(FsIO.openStream(p))
      try {
        if (in.readInt() != Magic || in.readInt() != Version) return None
        // the full key is re-validated from the sidecar body: the name
        // is only a hash of the path, and (len, mtime, mode) are the
        // invalidation rule — any mismatch means the file changed (or
        // a hash collision) and the sidecar is dead
        if (in.readUTF() != key.fmt || in.readUTF() != key.path ||
            in.readLong() != key.len || in.readLong() != key.mtime ||
            in.readUTF() != key.mode) return None
        val n = in.readInt()
        val b = IndexedSeq.newBuilder[(Long, Long, M)]
        var i = 0
        while (i < n) {
          val off = in.readLong(); val rows = in.readLong()
          b += ((off, rows, readMeta(in)))
          i += 1
        }
        Some(Entry(b.result(), complete = true))
      } finally in.close()
    } catch {
      case e: Exception =>
        org.slf4j.LoggerFactory.getLogger("graft.sources.index").warn(
          s"sidecar read failed for ${key.path}: ${e.getMessage}")
        None
    }
}
