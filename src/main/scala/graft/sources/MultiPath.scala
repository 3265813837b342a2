package graft.sources


/** Multi-path / glob resolution shared by the trajectory sources — the
  * Spark-native form of the reference's list-of-files `load` idiom
  * (core/dask_traj.py:59-84 delegates to mdtraj's `load`, whose first
  * argument may be a LIST of filenames; a porting user reaches for
  * `load([f1, f2, ...])` on day one).
  *
  * `DataFrameReader.load(paths: _*)` hands a DSv2 TableProvider one
  * `path` option for a single argument and a JSON-encoded string array
  * under `paths` for two or more — this object decodes both, plus a
  * trailing-segment glob (`dir/part-*.xyz`), into one ordered list of
  * concrete files. Order is load-argument order, then name order within
  * a directory or glob — the order that assigns globally contiguous
  * frame ids across files (shard k's frames continue where shard k-1
  * ended, the same contract the single-directory shard mode already
  * keeps).
  *
  * Resolution is a driver-side listing only (no file CONTENT is
  * touched); the per-file frame probes stay in each scan's
  * `planInputPartitions`, so a pushed frame_id range can still stop
  * probing past its upper bound.
  */
object MultiPath {

  /** Raw paths from DSv2 properties: `load(p)` arrives as `path`,
    * `load(p1, p2, ...)` as a JSON string array under `paths` (the
    * DataFrameReader encoding). Both present → paths first, then path
    * (matching Spark's own file-source merge order). */
  def rawPaths(fmt: String,
      properties: java.util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
      catch { case _: Exception => throw new IllegalArgumentException(
        s"$fmt option 'paths' must be a JSON string array (the " +
          s"DataFrameReader.load(paths: _*) encoding), got: '$json'") }
    }.getOrElse(Nil)
    val single = Option(properties.get("path")).toSeq
    val all = multi ++ single
    if (all.isEmpty) throw new IllegalArgumentException(
      s"$fmt source requires a path: load(file), load(directory), " +
        "load(paths: _*) or load(glob)")
    all
  }

  private def hasGlob(s: String): Boolean =
    s.exists(c => c == '*' || c == '?' || c == '[' || c == '{')

  /** Expand ONE raw path to its concrete files:
    *  - a plain file → itself (any name — the single-file contract);
    *  - a directory → its shard files matching `exts`, name order;
    *  - a glob (trailing segment only) → matching files, name order.
    */
  def expand(fmt: String, raw: String, exts: Seq[String]): Seq[String] = {
    if (hasGlob(raw)) {
      val slash = raw.lastIndexOf('/')
      val (dirPart, namePat) =
        if (slash < 0) (".", raw)
        else (raw.substring(0, slash), raw.substring(slash + 1))
      if (hasGlob(dirPart)) throw new IllegalArgumentException(
        s"$fmt load: glob is only supported in the trailing file-name " +
          s"segment, got '$raw'")
      if (!FsIO.isDirectory(dirPart)) throw new IllegalArgumentException(
        s"$fmt load: glob parent '$dirPart' is not a directory")
      val hits = FsIO.globFiles(dirPart, namePat)
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"$fmt load: glob '$raw' matched no files")
      hits
    } else {
      if (FsIO.isDirectory(raw)) {
        val shards = FsIO.list(raw)
          .filter(e => e.isFile &&
            exts.exists(e.name.toLowerCase.endsWith))
          .map(_.path)
        if (shards.isEmpty) throw new IllegalArgumentException(
          s"$fmt load: directory $raw contains no " +
            s"${exts.mkString("/")} shards")
        shards
      } else if (FsIO.isFile(raw)) Seq(raw)
      else throw new IllegalArgumentException(
        s"$fmt load: path not found: $raw")
    }
  }

  /** All raw paths expanded, order preserved — the file order that
    * assigns globally contiguous frame ids. */
  def expandAll(fmt: String, raws: Seq[String],
      exts: Seq[String]): Seq[String] =
    raws.flatMap(expand(fmt, _, exts))

  /** The single literal path the write and streaming surfaces require
    * (a sink / watched directory is one location, not a list). */
  def single(fmt: String, raws: Seq[String], what: String): String = {
    if (raws.size != 1 || hasGlob(raws.head))
      throw new IllegalArgumentException(
        s"$fmt $what requires a single literal path (no multi-path " +
          s"list, no glob), got: ${raws.mkString(", ")}")
    raws.head
  }
}
