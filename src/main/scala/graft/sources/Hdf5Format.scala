package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Clean-room parser for the subset of the public HDF5 file format
  * (HDF5 File Format Specification, versions 0 and 2 of the
  * superblock) that molecular-dynamics HDF5 trajectories actually
  * use. mdtraj's native `.h5` format and MSMBuilder's legacy `.lh5`
  * are pytables files: superblock v0, version-1 object headers,
  * old-style groups (symbol-table B-tree v1 + local heap + SNOD
  * nodes), and datasets stored contiguous or chunked (chunk B-tree
  * v1) with the deflate / shuffle / fletcher32 filters. Newer
  * libhdf5 writers emit superblock v2/v3 with version-2 ("OHDR")
  * object headers and compact link messages — both paths are
  * covered. Dense (fractal-heap) link storage, the v4 chunk indexes
  * and non-trivial datatypes fail fast with a clear message: MD
  * trajectory writers do not produce them.
  *
  * Everything here is derived from the public format specification;
  * no HDF5 library is consulted. The reference registry rows this
  * closes: `.h5/.hdf5 → [xyz, time, unitcell_lengths,
  * unitcell_angles]` and `.lh5 → [xyz]` (core/dask_traj.py:32-33,39).
  *
  * Scale note: the whole metadata graph of one trajectory file (a
  * handful of datasets, one chunk index each) is a few KB — the
  * planner reads it once per file for (frames, atoms), and each
  * executor partition re-reads it and then touches ONLY the chunks
  * intersecting its frame range, so a 1000-file scan stays O(header)
  * on the driver and O(own-slice) per task.
  */
private[graft] object Hdf5Format {

  /** The spec's "undefined address" — all-ones, reads as -1. */
  val Undef: Long = -1L

  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', 0x0D, 0x0A, 0x1A, 0x0A)

  def fail(path: String, what: String): Nothing =
    throw new IllegalArgumentException(s"hdf5 parse error in $path: $what")

  /** Structured-parse exception boundary: corrupted size/rank/length
    * fields make some decoder read past a buffer limit — rather than
    * bounds-checking every field read, the public entry points convert
    * those low-level errors into the parse-error contract here (an
    * IllegalArgumentException carrying the path). Valid-file behavior
    * is pinned by the golden-byte and round-trip suites, so this can
    * never mask a correct-path defect; Hdf5FuzzSpec drives 500 seeded
    * corruptions through it. */
  private def guarded[T](path: String)(body: => T): T =
    try body catch {
      case e: java.nio.BufferUnderflowException =>
        fail(path, "truncated or corrupt metadata structure " +
          s"(${e.getClass.getSimpleName})")
      case e: IndexOutOfBoundsException =>
        fail(path, "corrupt structure: field offset out of bounds " +
          s"(${e.getMessage})")
      case e: NegativeArraySizeException =>
        fail(path, s"corrupt structure: negative length (${e.getMessage})")
    }

  // ---- element types --------------------------------------------------

  /** Only the numeric scalar types a trajectory carries. `be` = big
    * endian. Anything else parses as [[Opaque]] and is readable only
    * as "skip this dataset". */
  sealed trait DType { def size: Int }
  final case class FloatT(size: Int, be: Boolean) extends DType
  final case class IntT(size: Int, be: Boolean, signed: Boolean)
      extends DType
  /** Anything non-numeric; `cls` keeps the datatype class so callers
    * can explain WHY a dataset is unreadable (3 = fixed string — the
    * readable-as-bytes case, 9 = variable-length). */
  final case class Opaque(size: Int, cls: Int = -1) extends DType

  // ---- storage layout -------------------------------------------------

  sealed trait Layout
  /** `addr` is already base-resolved (absolute file offset). */
  final case class Contiguous(addr: Long, nbytes: Long) extends Layout
  final case class Compact(data: Array[Byte]) extends Layout
  /** `chunkDims` excludes the trailing element-size entry the message
    * carries; rank matches the dataspace. `btreeAddr` is
    * base-resolved; `base` rides along because the B-tree's child
    * pointers (chunk data addresses) are base-relative too. */
  final case class Chunked(btreeAddr: Long, chunkDims: Array[Int],
      base: Long = 0L) extends Layout

  final case class Filter(id: Int, clientValues: Array[Int])
  val FilterDeflate = 1
  val FilterShuffle = 2
  val FilterFletcher32 = 3

  final case class Dataset(name: String, dims: Array[Long], dtype: DType,
      layout: Layout, filters: Seq[Filter]) {
    def rank: Int = dims.length
    def rowElems: Long = if (rank <= 1) 1L else dims.drop(1).product
  }

  final case class H5File(datasets: Map[String, Dataset])

  // ---- low-level reads ------------------------------------------------

  private final class In(raf: FsRandom, val path: String) {
    def at(addr: Long, n: Int): ByteBuffer = {
      if (addr < 0 || n < 0 || addr + n > raf.length())
        fail(path, s"read [$addr, ${addr + n}) outside file of length " +
          s"${raf.length()}")
      val b = new Array[Byte](n)
      raf.seek(addr)
      raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def u16(bb: ByteBuffer): Int = bb.getShort & 0xFFFF
  private def u8(bb: ByteBuffer): Int = bb.get & 0xFF

  // ---- superblock -----------------------------------------------------

  /** The spec allows the superblock at byte 0 or at any power-of-two
    * offset ≥ 512 (user block). Returns the address of the ROOT GROUP
    * object header plus the base address all file addresses are
    * relative to. */
  private def parseSuperblock(in: In, fileLen: Long): (Long, Long) = {
    var off = 0L
    var found = -1L
    while (found < 0 && off + 8 <= fileLen) {
      val sig = in.at(off, 8)
      val ok = Signature.forall(b => sig.get == b)
      if (ok) found = off
      else off = if (off == 0) 512 else off * 2
    }
    if (found < 0) fail(in.path, "no HDF5 signature (not an HDF5 file)")
    // 72 bytes covers the longest variant (v1 adds 4 K-field bytes
    // over v0's 64); short reads here mean a truncated superblock
    val bb = in.at(found + 8, 72)
    val version = u8(bb)
    version match {
      case 0 | 1 =>
        // freespace ver, root group ver, reserved, shared-header ver
        bb.position(bb.position() + 4)
        val sizeOff = u8(bb); val sizeLen = u8(bb)
        if (sizeOff != 8 || sizeLen != 8)
          fail(in.path, s"offset/length sizes $sizeOff/$sizeLen — only " +
            "8/8 (every mainstream writer) is supported")
        u8(bb) // reserved
        u16(bb); u16(bb) // group leaf / internal K
        bb.getInt // file consistency flags
        if (version == 1) { u16(bb); u16(bb) } // indexed-storage K
        val baseField = bb.getLong
        // libhdf5 records the superblock offset (= user-block size) as
        // the base; trust the field, but a zero field under a found
        // user block still means "addresses are superblock-relative"
        val base = if (baseField != 0) baseField else found
        bb.getLong // free-space address
        bb.getLong // end-of-file address
        bb.getLong // driver info address
        // root group symbol table entry: link name offset, OH address
        bb.getLong
        val rootOh = bb.getLong
        (base + rootOh, base)
      case 2 | 3 =>
        val sizeOff = u8(bb); val sizeLen = u8(bb)
        if (sizeOff != 8 || sizeLen != 8)
          fail(in.path, s"offset/length sizes $sizeOff/$sizeLen — only " +
            "8/8 is supported")
        u8(bb) // file consistency flags
        val baseField = bb.getLong
        val base = if (baseField != 0) baseField else found
        bb.getLong // superblock extension
        bb.getLong // end-of-file
        val rootOh = bb.getLong
        (base + rootOh, base)
      case v => fail(in.path, s"superblock version $v not supported")
    }
  }

  // ---- object headers -------------------------------------------------

  private final case class Msg(tpe: Int, body: ByteBuffer)

  private val MsgDataspace = 0x0001
  private val MsgLinkInfo = 0x0002
  private val MsgDatatype = 0x0003
  private val MsgLink = 0x0006
  private val MsgLayout = 0x0008
  private val MsgFilters = 0x000B
  private val MsgContinuation = 0x0010
  private val MsgSymbolTable = 0x0011

  /** Reads all messages of one object header, following continuation
    * blocks, for either header version. `base` is the superblock's
    * base address — EVERY address stored in the file (continuation
    * blocks included) is relative to it. */
  private def readMessages(in: In, addr: Long, base: Long): Seq[Msg] = {
    val probe = in.at(addr, 4)
    val sig = new Array[Byte](4); probe.get(sig)
    if (sig.sameElements("OHDR".getBytes("ASCII")))
      readMessagesV2(in, addr, base)
    else readMessagesV1(in, addr, base)
  }

  private def readMessagesV1(in: In, addr: Long, base: Long): Seq[Msg] = {
    val head = in.at(addr, 16)
    val version = u8(head)
    if (version != 1)
      fail(in.path, s"object header version $version at $addr (expected " +
        "1, or an OHDR v2 signature)")
    u8(head) // reserved
    val totalMsgs = u16(head)
    head.getInt // reference count
    val firstSize = head.getInt
    // 4 bytes padding: messages begin at addr+16
    val out = Vector.newBuilder[Msg]
    var remaining = totalMsgs
    // (block address, block size) queue; continuation bodies are raw
    // v1 message streams with no signature. `visited` guards against
    // corrupt continuation cycles (a flipped pointer aiming a block
    // at itself would otherwise loop forever).
    var blocks = List((addr + 16, firstSize.toLong))
    val visited = scala.collection.mutable.Set.empty[Long]
    while (remaining > 0 && blocks.nonEmpty) {
      val (bAddr, bSize) = blocks.head
      blocks = blocks.tail
      if (!visited.add(bAddr))
        fail(in.path, s"object header continuation cycle at $bAddr")
      if (bSize > 64 * 1024 * 1024)
        fail(in.path, s"object header block of $bSize bytes")
      val bb = in.at(bAddr, bSize.toInt)
      while (remaining > 0 && bb.remaining() >= 8) {
        val tpe = u16(bb)
        val size = u16(bb)
        u8(bb); bb.position(bb.position() + 3) // flags + reserved
        if (size > bb.remaining())
          fail(in.path, s"message type $tpe of $size bytes overruns its " +
            "header block")
        val body = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
        body.limit(size)
        bb.position(bb.position() + size)
        remaining -= 1
        if (tpe == MsgContinuation) {
          val cb = body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
          blocks = blocks :+ ((base + cb.getLong, cb.getLong))
        } else out += Msg(tpe, body)
      }
    }
    out.result()
  }

  private def readMessagesV2(in: In, addr: Long, base: Long): Seq[Msg] = {
    val head = in.at(addr, 16)
    head.getInt // "OHDR"
    val version = u8(head)
    if (version != 2) fail(in.path, s"OHDR version $version")
    val flags = u8(head)
    var p = addr + 6
    if ((flags & 0x20) != 0) p += 16 // 4 timestamps
    if ((flags & 0x10) != 0) p += 4 // phase-change limits
    val szBytes = 1 << (flags & 0x3)
    val szBuf = in.at(p, szBytes)
    val chunk0 = szBytes match {
      case 1 => u8(szBuf).toLong
      case 2 => u16(szBuf).toLong
      case 4 => szBuf.getInt.toLong
      case 8 => szBuf.getLong
    }
    p += szBytes
    val creationOrder = (flags & 0x04) != 0
    val out = Vector.newBuilder[Msg]
    // (message-bytes address, length) — v2 continuation blocks carry an
    // OCHK signature and a trailing checksum around the message bytes;
    // `visited` guards against corrupt continuation cycles
    var blocks = List((p, chunk0))
    val visited = scala.collection.mutable.Set.empty[Long]
    while (blocks.nonEmpty) {
      val (bAddr, bSize) = blocks.head
      blocks = blocks.tail
      if (!visited.add(bAddr))
        fail(in.path, s"object header continuation cycle at $bAddr")
      if (bSize > 64 * 1024 * 1024)
        fail(in.path, s"object header block of $bSize bytes")
      val bb = in.at(bAddr, bSize.toInt)
      // a v2 message prefix is 4 bytes (+2 creation order)
      val prefix = if (creationOrder) 6 else 4
      while (bb.remaining() >= prefix) {
        val tpe = u8(bb)
        val size = u16(bb)
        u8(bb) // flags
        if (creationOrder) u16(bb)
        if (size > bb.remaining())
          fail(in.path, s"message type $tpe of $size bytes overruns its " +
            "OHDR block")
        val body = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
        body.limit(size)
        bb.position(bb.position() + size)
        if (tpe == MsgContinuation) {
          val cb = body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
          val cAddr = base + cb.getLong; val cLen = cb.getLong
          // strip "OCHK" (4) and checksum (4)
          blocks = blocks :+ ((cAddr + 4, cLen - 8))
        } else if (tpe != 0) out += Msg(tpe, body)
      }
    }
    out.result()
  }

  // ---- message decoders ----------------------------------------------

  private def parseDataspace(in: In, m: Msg): Array[Long] = {
    val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = u8(bb)
    val rank = u8(bb)
    version match {
      case 1 =>
        u8(bb) // flags
        bb.position(bb.position() + 5) // reserved
      case 2 =>
        u8(bb) // flags
        u8(bb) // type (0 scalar / 1 simple / 2 null)
      case v => fail(in.path, s"dataspace version $v")
    }
    Array.tabulate(rank)(_ => bb.getLong)
  }

  private def parseDatatype(in: In, m: Msg): DType = {
    val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val cv = u8(bb)
    val cls = cv & 0x0F
    val bits0 = u8(bb); u8(bb); u8(bb) // 24 class bit-field bits
    val size = bb.getInt
    val be = (bits0 & 0x1) != 0
    cls match {
      case 0 => // fixed-point
        IntT(size, be, signed = (bits0 & 0x08) != 0)
      case 1 => // floating-point; trust size: 4 = IEEE single, 8 = double
        if (size != 4 && size != 8)
          fail(in.path, s"float datatype of $size bytes")
        FloatT(size, be)
      case c => Opaque(size, c)
    }
  }

  private def parseLayout(in: In, m: Msg, path: String, base: Long)
      : (Layout, Int) = {
    val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    def resolve(a: Long): Long = if (a == Undef) a else base + a
    val version = u8(bb)
    version match {
      case 1 | 2 =>
        val rankPlus = u8(bb) // dimensionality (includes element size dim)
        val cls = u8(bb)
        bb.position(bb.position() + 5) // reserved
        cls match {
          case 0 => // compact: dims, 4B element size? v1/2 compact rare
            fail(path, "compact layout v1/2 is not supported")
          case 1 =>
            val addr = bb.getLong
            val dims = Array.tabulate(rankPlus)(_ => bb.getInt)
            val elem = bb.getInt
            (Contiguous(resolve(addr),
              dims.map(_.toLong).product * elem), elem)
          case 2 =>
            val addr = bb.getLong
            val dims = Array.tabulate(rankPlus)(_ => bb.getInt)
            val elem = bb.getInt
            (Chunked(resolve(addr), dims, base), elem)
          case c => fail(path, s"layout class $c")
        }
      case 3 =>
        val cls = u8(bb)
        cls match {
          case 0 =>
            val n = u16(bb)
            val d = new Array[Byte](n); bb.get(d)
            (Compact(d), 0)
          case 1 =>
            val addr = bb.getLong
            val n = bb.getLong
            (Contiguous(resolve(addr), n), 0)
          case 2 =>
            val rankPlus = u8(bb) // rank + 1; last dim entry = elem size
            val addr = bb.getLong
            val dims = Array.tabulate(rankPlus)(_ => bb.getInt)
            (Chunked(resolve(addr), dims.dropRight(1), base), dims.last)
          case c => fail(path, s"layout class $c")
        }
      case 4 =>
        fail(path, "layout message v4 (single/implicit/fixed-array/" +
          "extensible-array/v2-btree chunk indexes) is not supported — " +
          "write with the default libver for a chunk B-tree v1 index")
      case v => fail(path, s"layout version $v")
    }
  }

  private def parseFilters(in: In, m: Msg): Seq[Filter] = {
    val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = u8(bb)
    val n = u8(bb)
    val out = Vector.newBuilder[Filter]
    version match {
      case 1 =>
        u16(bb); bb.getInt // reserved
        (0 until n).foreach { _ =>
          val id = u16(bb)
          val nameLen = u16(bb)
          u16(bb) // flags (bit0: optional filter)
          val ncv = u16(bb)
          val namePad = (nameLen + 7) / 8 * 8
          bb.position(bb.position() + namePad)
          val cvs = Array.tabulate(ncv)(_ => bb.getInt)
          if (ncv % 2 == 1) bb.getInt // pad to 8
          out += Filter(id, cvs)
        }
      case 2 =>
        (0 until n).foreach { _ =>
          val id = u16(bb)
          val nameLen = if (id >= 256) u16(bb) else 0
          u16(bb) // flags
          val ncv = u16(bb)
          bb.position(bb.position() + nameLen)
          val cvs = Array.tabulate(ncv)(_ => bb.getInt)
          out += Filter(id, cvs)
        }
      case v => fail(in.path, s"filter pipeline version $v")
    }
    out.result()
  }

  // ---- group traversal ------------------------------------------------

  /** (name, object header address) pairs of one group's links, old
    * style (symbol table) or new style (compact link messages). */
  private def groupLinks(in: In, msgs: Seq[Msg], base: Long)
      : Seq[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    msgs.find(_.tpe == MsgSymbolTable).foreach { m =>
      val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val btree = bb.getLong
      val heap = bb.getLong
      out ++= walkGroupBtree(in, base + btree, base + heap, base)
    }
    msgs.find(_.tpe == MsgLinkInfo).foreach { m =>
      val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      u8(bb) // version
      val flags = u8(bb)
      if ((flags & 0x1) != 0) bb.getLong // max creation index
      val fheap = bb.getLong
      if (fheap != Undef)
        fail(in.path, "dense (fractal-heap) group link storage is not " +
          "supported — trajectory files keep links compact")
    }
    msgs.filter(_.tpe == MsgLink).foreach { m =>
      val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val version = u8(bb)
      if (version != 1) fail(in.path, s"link message version $version")
      val flags = u8(bb)
      val linkType = if ((flags & 0x08) != 0) u8(bb) else 0
      if ((flags & 0x04) != 0) bb.getLong // creation order
      if ((flags & 0x10) != 0) u8(bb) // charset
      val nameLen = (flags & 0x3) match {
        case 0 => u8(bb).toLong
        case 1 => u16(bb).toLong
        case 2 => bb.getInt.toLong
        case 3 => bb.getLong
      }
      val nb = new Array[Byte](nameLen.toInt); bb.get(nb)
      val name = new String(nb, "UTF-8")
      if (linkType == 0) out += ((name, base + bb.getLong))
      // soft/external links: irrelevant to trajectory layout, skipped
    }
    out.result()
  }

  private def walkGroupBtree(in: In, addr: Long, heapAddr: Long,
      base: Long): Seq[(String, Long)] = {
    // local heap: signature HEAP, version, 3 reserved, data seg size,
    // free-list head, data segment address
    val hb = in.at(heapAddr, 32)
    val hsig = new Array[Byte](4); hb.get(hsig)
    if (!hsig.sameElements("HEAP".getBytes("ASCII")))
      fail(in.path, s"expected local heap at $heapAddr")
    hb.getInt // version + reserved
    val heapLen = hb.getLong
    hb.getLong // free list head
    val heapData = in.at(base + hb.getLong,
      math.min(heapLen, 1L << 20).toInt)

    def heapName(off: Long): String = {
      val arr = heapData.array()
      var i = off.toInt
      val sb = new StringBuilder
      while (i < arr.length && arr(i) != 0) { sb.append(arr(i).toChar)
        i += 1 }
      sb.toString
    }

    // cycle guard: a corrupt child pointer aiming back up the tree
    // would otherwise recurse forever
    val visited = scala.collection.mutable.Set.empty[Long]
    def walk(nodeAddr: Long): Seq[(String, Long)] = {
      if (!visited.add(nodeAddr))
        fail(in.path, s"group B-tree cycle at $nodeAddr")
      val nb = in.at(nodeAddr, 24)
      val sig = new Array[Byte](4); nb.get(sig)
      if (sig.sameElements("SNOD".getBytes("ASCII"))) {
        u8(nb); u8(nb) // version, reserved
        val nsym = u16(nb)
        val eb = in.at(nodeAddr + 8, nsym * 40)
        (0 until nsym).map { _ =>
          val nameOff = eb.getLong
          val oh = eb.getLong
          eb.getInt; eb.getInt // cache type, reserved
          eb.position(eb.position() + 16) // scratch
          (heapName(nameOff), base + oh)
        }
      } else if (sig.sameElements("TREE".getBytes("ASCII"))) {
        val nodeType = u8(nb)
        u8(nb) // level — children are SNODs or TREEs; sniff on walk
        val used = u16(nb)
        if (nodeType != 0)
          fail(in.path, s"group B-tree node type $nodeType at $nodeAddr")
        nb.getLong; nb.getLong // siblings
        // entries: key0 child0 key1 child1 ... childN-1 keyN
        val body = in.at(nodeAddr + 24, (2 * used + 1) * 8)
        (0 until used).flatMap { i =>
          body.position((2 * i + 1) * 8)
          walk(base + body.getLong)
        }
      } else fail(in.path,
        s"expected TREE or SNOD at $nodeAddr, got " +
          new String(sig, "ASCII"))
    }
    walk(addr)
  }

  // ---- chunk index ----------------------------------------------------

  /** One stored chunk: grid offset of its first element per dim (the
    * key's trailing element-size 0 stripped), the raw byte address and
    * stored (possibly compressed) size, and the per-chunk filter
    * mask. */
  final case class ChunkRef(offsets: Array[Long], addr: Long,
      storedBytes: Int, filterMask: Int)

  /** Chunk refs in ascending dim-0 order (the B-tree's key order;
    * sorted defensively so [[SlabReader]]'s binary search always
    * holds). Addresses are base-resolved absolute offsets. */
  def chunkIndex(raf: FsRandom, path: String, ds: Dataset): Seq[ChunkRef] = {
    val in = new In(raf, path)
    val ch = ds.layout match {
      case c: Chunked => c
      case _ => fail(path, s"dataset ${ds.name} is not chunked")
    }
    if (ch.btreeAddr == Undef) Nil // no chunks ever written
    else guarded(path) { chunkIndexWalk(in, path, ds, ch) }
  }

  private def chunkIndexWalk(in: In, path: String, ds: Dataset,
      ch: Chunked): Seq[ChunkRef] = {
    val rank = ds.rank
    val visited = scala.collection.mutable.Set.empty[Long]
    def walk(addr: Long): Seq[ChunkRef] = {
      if (!visited.add(addr))
        fail(path, s"chunk B-tree cycle at $addr")
      val nb = in.at(addr, 24)
      val sig = new Array[Byte](4); nb.get(sig)
      if (!sig.sameElements("TREE".getBytes("ASCII")))
        fail(path, s"expected chunk B-tree node at $addr")
      val nodeType = u8(nb)
      if (nodeType != 1)
        fail(path, s"chunk B-tree node type $nodeType at $addr")
      val level = u8(nb)
      val used = u16(nb)
      nb.getLong; nb.getLong // siblings
      // key: 4B size, 4B filter mask, (rank+1) × 8B offsets; then child
      val keyBytes = 8 + (rank + 1) * 8
      val body = in.at(addr + 24, used * (keyBytes + 8) + keyBytes)
      (0 until used).flatMap { i =>
        body.position(i * (keyBytes + 8))
        val stored = body.getInt
        val mask = body.getInt
        val offs = Array.tabulate(rank + 1)(_ => body.getLong)
        val child = ch.base + body.getLong
        if (level == 0)
          Seq(ChunkRef(offs.dropRight(1), child, stored, mask))
        else walk(child)
      }
    }
    walk(ch.btreeAddr).sortBy(_.offsets(0))
  }

  // ---- filters --------------------------------------------------------

  def defilter(path: String, raw: Array[Byte], filters: Seq[Filter],
      mask: Int, elemSize: Int, expectBytes: Int): Array[Byte] = {
    var data = raw
    // applied in pipeline order on write → undone in reverse on read
    val active = filters.zipWithIndex.reverse
      .filter { case (_, i) => (mask & (1 << i)) == 0 }
    active.foreach { case (f, _) =>
      f.id match {
        case FilterDeflate =>
          val inf = new Inflater()
          inf.setInput(data)
          val out = new Array[Byte](expectBytes)
          var got = 0
          try {
            while (got < expectBytes && !inf.finished()) {
              val n = inf.inflate(out, got, expectBytes - got)
              if (n == 0 && inf.needsInput())
                fail(path, "truncated deflate chunk")
              got += n
            }
          } catch {
            case e: java.util.zip.DataFormatException =>
              fail(path, s"corrupt deflate chunk: ${e.getMessage}")
          } finally inf.end()
          data = out
        case FilterShuffle =>
          val sz = f.clientValues.headOption.getOrElse(elemSize)
          // HDF5 unshuffles the first n*sz bytes and passes any trailing
          // remainder through verbatim (H5Zshuffle.c) — match that rather
          // than skipping the whole chunk on a non-multiple length.
          if (sz > 1 && data.length >= sz) {
            val n = data.length / sz
            val body = n * sz
            val out = new Array[Byte](data.length)
            var b = 0
            while (b < sz) {
              var i = 0
              while (i < n) {
                out(i * sz + b) = data(b * n + i)
                i += 1
              }
              b += 1
            }
            var r = body
            while (r < data.length) { out(r) = data(r); r += 1 }
            data = out
          }
        case FilterFletcher32 =>
          if (data.length < 4) fail(path, "fletcher32 chunk too short")
          val payload = java.util.Arrays.copyOf(data, data.length - 4)
          val stored = ByteBuffer.wrap(data, data.length - 4, 4)
            .order(ByteOrder.LITTLE_ENDIAN).getInt
          if (fletcher32(payload) != stored)
            fail(path, "fletcher32 checksum mismatch — corrupt chunk")
          data = payload
        case other =>
          fail(path, s"filter id $other is not supported (deflate/" +
            "shuffle/fletcher32 are)")
      }
    }
    data
  }

  /** HDF5's fletcher32 over 16-bit big-endian words (trailing odd byte
    * zero-padded). Sums are reduced by ones'-complement folding
    * ((x & 0xffff) + (x >>> 16) until < 2^16), exactly as libhdf5's
    * H5_checksum_fletcher32 does — NOT mod 65535, which would map a
    * running sum that is a nonzero multiple of 65535 to 0 where HDF5
    * keeps 0xFFFF, rejecting a valid libhdf5-written chunk. */
  def fletcher32(data: Array[Byte]): Int = {
    @inline def fold(x: Long): Long = {
      var v = x
      while ((v >>> 16) != 0) v = (v & 0xFFFF) + (v >>> 16)
      v
    }
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    val n = data.length
    while (i + 1 < n) {
      val w = ((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)
      sum1 += w; sum2 += sum1
      if (sum1 >= 0x7FFF000L) { sum1 = fold(sum1); sum2 = fold(sum2) }
      i += 2
    }
    if (i < n) { sum1 += (data(i) & 0xFF) << 8; sum2 += sum1 }
    sum1 = fold(sum1); sum2 = fold(sum2)
    ((sum2 << 16) | sum1).toInt
  }

  // ---- whole-file parse ----------------------------------------------

  /** Parses the metadata graph: superblock → root group → (nested)
    * datasets. Nested group members get "/"-joined names; recursion is
    * capped at depth 4 (trajectory conventions are flat or one level
    * deep). */
  def parse(raf: FsRandom, path: String): H5File = guarded(path) {
    val in = new In(raf, path)
    val (rootOh, base) = parseSuperblock(in, raf.length())
    val out = Map.newBuilder[String, Dataset]

    def visit(name: String, ohAddr: Long, depth: Int): Unit = {
      if (depth > 4) return
      val msgs = readMessages(in, ohAddr, base)
      val space = msgs.find(_.tpe == MsgDataspace)
      val dtype = msgs.find(_.tpe == MsgDatatype)
      val layout = msgs.find(_.tpe == MsgLayout)
      (space, dtype, layout) match {
        case (Some(s), Some(t), Some(l)) =>
          val dims = parseDataspace(in, s)
          val dt = parseDatatype(in, t)
          val (lay, layElem) = parseLayout(in, l, path, base)
          // v1/2 layout gives elem size redundantly; cross-check
          if (layElem > 0 && dt.size > 0 && layElem != dt.size &&
              !dt.isInstanceOf[Opaque])
            fail(path, s"dataset $name: layout element size $layElem " +
              s"!= datatype size ${dt.size}")
          val filters = msgs.find(_.tpe == MsgFilters)
            .map(parseFilters(in, _)).getOrElse(Nil)
          out += name -> Dataset(name, dims, dt, lay, filters)
        case _ =>
          groupLinks(in, msgs, base).foreach { case (child, a) =>
            val full = if (name.isEmpty) child else s"$name/$child"
            visit(full, a, depth + 1)
          }
      }
    }
    visit("", rootOh, 0)
    H5File(out.result())
  }

  // ---- slab reads -----------------------------------------------------

  /** Positioned reader for one dataset: `readSlab(lo, hi)` returns the
    * rows [lo, hi) of dimension 0, row-major, as doubles (int types
    * sign-extended, floats widened). Chunked storage keeps a one-chunk
    * decompressed cache, so a partition scanning its frames in order
    * inflates each chunk exactly once. */
  final class SlabReader(raf: FsRandom, path: String, ds: Dataset) {
    private val elem = ds.dtype.size
    private val rowElems = ds.rowElems
    private lazy val chunks: IndexedSeq[ChunkRef] =
      chunkIndex(raf, path, ds).toIndexedSeq
    private var cachedAddr = -1L
    private var cachedChunk: Array[Byte] = _

    private def convert(bytes: Array[Byte], elemOff: Int, n: Int,
        out: Array[Double], outOff: Int): Unit = {
      val order =
        ds.dtype match {
          case FloatT(_, be) =>
            if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          case IntT(_, be, _) =>
            if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          case _ => ByteOrder.LITTLE_ENDIAN
        }
      val bb = ByteBuffer.wrap(bytes).order(order)
      var i = 0
      ds.dtype match {
        case FloatT(4, _) =>
          while (i < n) { out(outOff + i) =
            bb.getFloat((elemOff + i) * 4).toDouble; i += 1 }
        case FloatT(8, _) =>
          while (i < n) { out(outOff + i) =
            bb.getDouble((elemOff + i) * 8); i += 1 }
        case IntT(1, _, signed) =>
          while (i < n) {
            val v = bytes(elemOff + i)
            out(outOff + i) = if (signed) v.toDouble else (v & 0xFF)
            i += 1
          }
        case IntT(2, _, signed) =>
          while (i < n) {
            val v = bb.getShort((elemOff + i) * 2)
            out(outOff + i) = if (signed) v.toDouble else (v & 0xFFFF)
            i += 1
          }
        case IntT(4, _, signed) =>
          while (i < n) {
            val v = bb.getInt((elemOff + i) * 4)
            out(outOff + i) =
              if (signed) v.toDouble else (v.toLong & 0xFFFFFFFFL).toDouble
            i += 1
          }
        case IntT(8, _, _) =>
          while (i < n) { out(outOff + i) =
            bb.getLong((elemOff + i) * 8).toDouble; i += 1 }
        case t => fail(path, s"dataset ${ds.name}: cannot read " +
          s"element type $t")
      }
    }

    def readSlab(lo: Long, hi: Long): Array[Double] = guarded(path) {
      val rows = (hi - lo).toInt
      val out = new Array[Double]((rows * rowElems).toInt)
      ds.layout match {
        case Contiguous(addr, _) =>
          val n = (rows * rowElems).toInt
          val b = new Array[Byte](n * elem)
          raf.seek(addr + lo * rowElems * elem)
          raf.readFully(b)
          convert(b, 0, n, out, 0)
        case Compact(data) =>
          convert(data, (lo * rowElems).toInt, (rows * rowElems).toInt,
            out, 0)
        case Chunked(_, cDims, _) =>
          if (cDims.length != ds.rank)
            fail(path, s"dataset ${ds.name}: chunk rank ${cDims.length} " +
              s"!= dataspace rank ${ds.rank}")
          // trajectory writers chunk only along dim 0 (pytables EArray
          // contract); verify and use plain row arithmetic
          var d = 1
          while (d < ds.rank) {
            if (cDims(d).toLong != ds.dims(d))
              fail(path, s"dataset ${ds.name}: chunked across a " +
                "non-extendable dimension — only dim-0 chunking (the " +
                "EArray layout every trajectory writer emits) is " +
                "supported")
            d += 1
          }
          val cRows = cDims(0)
          // Long-space size check BEFORE any allocation: corrupt chunk
          // dims (or a flipped stored-size field) must fail, not OOM.
          // The bound is PRINCIPLED, not a magic constant: a chunk
          // cannot meaningfully exceed ~the dataset it stores (edge
          // chunks round up by one chunk), and a decompressed chunk
          // must be JVM-array-addressable — so any real chunkshape of
          // any system size passes, while a corrupt dim claiming
          // gigabytes beyond the dataset fails cleanly.
          val totalBytesL = ds.dims.foldLeft(elem.toLong) { (a, d) =>
            if (a > (1L << 42)) a else a * math.max(d, 1L)
          }
          val chunkBytesL = cRows.toLong * rowElems * elem
          if (chunkBytesL <= 0 || chunkBytesL > Int.MaxValue - 8 ||
              chunkBytesL > 2 * totalBytesL + 4096)
            fail(path, s"dataset ${ds.name}: chunk of $chunkBytesL " +
              s"bytes against a $totalBytesL-byte dataset (corrupt " +
              "dims)")
          val chunkBytes = chunkBytesL.toInt
          // binary search for the first chunk intersecting [lo, hi)
          // — chunkIndex returns refs ascending in dim 0, so the
          // frame-by-frame partition loop costs O(log chunks + chunks
          // touched) per call, not a scan of the whole file's index
          val cs = chunks
          var sLo = 0
          var sHi = cs.length
          while (sLo < sHi) {
            val mid = (sLo + sHi) >>> 1
            if (cs(mid).offsets(0) + cRows <= lo) sLo = mid + 1
            else sHi = mid
          }
          var ci = sLo
          while (ci < cs.length && cs(ci).offsets(0) < hi) {
            val c = cs(ci)
            val c0 = c.offsets(0)
            val first = math.max(lo, c0)
            val last = math.min(hi, c0 + cRows)
            if (first < last) {
              if (cachedAddr != c.addr) {
                if (c.storedBytes < 0 ||
                    c.storedBytes > chunkBytes + (chunkBytes >> 2) + 4096)
                  fail(path, s"dataset ${ds.name}: stored chunk of " +
                    s"${c.storedBytes} bytes for a $chunkBytes-byte " +
                    "chunk — corrupt index entry")
                val raw = new Array[Byte](c.storedBytes)
                raf.seek(c.addr)
                raf.readFully(raw)
                cachedChunk = defilter(path, raw, ds.filters, c.filterMask,
                  elem, chunkBytes)
                cachedAddr = c.addr
              }
              val n = ((last - first) * rowElems).toInt
              convert(cachedChunk, ((first - c0) * rowElems).toInt, n,
                out, ((first - lo) * rowElems).toInt)
            }
            ci += 1
          }
      }
      out
    }
  }
}
