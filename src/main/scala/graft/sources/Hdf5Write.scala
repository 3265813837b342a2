package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** HDF5 writer for the mdtraj trajectory convention — the write half
  * of the [[Hdf5DataSource]] round-trip (SURVEY §2.1 S6 per-format
  * parity). Emits the exact layout pytables produces for these files:
  * superblock version 0, version-1 object headers, an old-style root
  * group (symbol-table B-tree v1 + local heap + one SNOD), and
  * datasets either contiguous or chunked along dim 0 with the
  * deflate (+ optional shuffle) filter over a chunk B-tree v1 — all
  * serialized directly from the public format specification, no HDF5
  * library.
  *
  * `.h5` profile (mdtraj convention, units nm/ps/degrees):
  * `coordinates(frame, atom, 3) float32` chunked+gzip, `time(frame)
  * float32`, optional `cell_lengths`/`cell_angles(frame, 3) float32`,
  * plus the convention's root attributes. `.lh5` profile (legacy
  * MSMBuilder): `XYZList(frame, atom, 3) int16` = round(nm × 1000),
  * chunked+gzip.
  *
  * Scope note: the file is assembled in memory (addresses are
  * back-patched), bounding one write to ~2 GB of raw data — ample
  * for fixtures and the reference-workload bench (340 MB raw). A
  * fleet-scale HDF5 SINK would emit one self-contained shard file
  * per task like the other formats' writers; reads at any scale go
  * through [[Hdf5DataSource]], which has no such bound.
  */
object Hdf5Write {

  final case class Frame(
      xyz: Array[Float], // x0,y0,z0,x1,... (nm)
      cellLengths: Option[Array[Float]] = None,
      cellAngles: Option[Array[Float]] = None,
      time: Float = 0.0f)

  // ---- growable little-endian byte builder with back-patching --------

  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        val need = len.toLong + n
        // JVM arrays cap at Int.MaxValue-8; doubling past 2^30 would
        // overflow Int and crash with a negative-size error — fail with
        // the real reason instead.
        require(need <= Int.MaxValue - 8,
          s"hdf5 write: assembly buffer would need $need bytes, past " +
            "the JVM array bound — shard the write")
        var cap = arr.length.toLong
        while (need > cap) cap *= 2
        arr = java.util.Arrays.copyOf(arr,
          math.min(cap, (Int.MaxValue - 8).toLong).toInt)
      }
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { u16((v & 0xFFFF).toInt)
      u16(((v >> 16) & 0xFFFF).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length)
      System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def patchU64(at: Int, v: Long): Unit = {
      var i = 0; var x = v
      while (i < 8) { arr(at + i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  // ---- datatype / dataspace message bodies ---------------------------

  /** IEEE float LE datatype message body (class 1, version 1). */
  private def floatType(b: Buf, size: Int): Unit = {
    b.u8(0x11) // version 1 << 4 | class 1
    // bit field: order LE, lo/hi pad 0, mantissa normalization =
    // implied (2 << 4), sign location in byte 1
    b.u8(0x20); b.u8(if (size == 4) 31 else 63); b.u8(0)
    b.u32(size)
    b.u16(0) // bit offset
    b.u16(size * 8) // precision
    if (size == 4) { b.u8(23); b.u8(8); b.u8(0); b.u8(23); b.u32(127) }
    else { b.u8(52); b.u8(11); b.u8(0); b.u8(52); b.u32(1023) }
  }

  /** Signed int LE datatype message body (class 0, version 1). */
  private def intType(b: Buf, size: Int): Unit = {
    b.u8(0x10)
    b.u8(0x08); b.u8(0); b.u8(0) // LE, signed
    b.u32(size)
    b.u16(0); b.u16(size * 8)
  }

  /** Fixed-length NUL-padded ASCII string datatype body (class 3,
    * version 1) — the shape pytables gives mdtraj's embedded
    * `topology` JSON dataset. */
  private def strType(b: Buf, size: Int): Unit = {
    b.u8(0x13)
    b.u8(0); b.u8(0); b.u8(0) // NUL-pad, ASCII
    b.u32(size)
  }

  /** Simple dataspace v1 body, no max dims. */
  private def dataspace(b: Buf, dims: Seq[Long]): Unit = {
    b.u8(1); b.u8(dims.length); b.u8(0); b.zeros(5)
    dims.foreach(b.u64)
  }

  // ---- v1 object header assembly -------------------------------------

  private final case class RawMsg(tpe: Int, body: Array[Byte])

  private def msgBody(f: Buf => Unit): Array[Byte] = {
    val b = new Buf; f(b); b.result
  }

  /** Serializes a v1 object header (prefix + padded messages) at the
    * current position. All messages fit one block — no continuations
    * needed at fixture scale. */
  private def objectHeader(b: Buf, msgs: Seq[RawMsg]): Unit = {
    val padded = msgs.map(m => (m.body.length + 7) / 8 * 8)
    val total = padded.map(_ + 8).sum
    b.u8(1); b.u8(0) // version, reserved
    b.u16(msgs.length)
    b.u32(1) // reference count
    b.u32(total)
    b.zeros(4) // pad to 8-byte alignment
    msgs.zip(padded).foreach { case (m, p) =>
      b.u16(m.tpe); b.u16(p); b.u8(0); b.zeros(3)
      b.bytes(m.body)
      b.zeros(p - m.body.length)
    }
  }

  /** String attribute message body (v1): fixed-length ASCII scalar —
    * the mdtraj convention's root metadata shape. */
  private def strAttr(name: String, value: String): RawMsg = {
    val b = new Buf
    val nb = name.getBytes("UTF-8") :+ 0.toByte
    val vb = value.getBytes("UTF-8")
    val dt = msgBody { t => // string datatype: class 3, nul-pad ASCII
      t.u8(0x13); t.u8(0); t.u8(0); t.u8(0); t.u32(vb.length)
    }
    val ds = msgBody(dataspace(_, Nil)) // scalar
    b.u8(1); b.u8(0)
    b.u16(nb.length); b.u16(dt.length); b.u16(ds.length)
    def pad8(x: Array[Byte]): Unit = {
      b.bytes(x); b.zeros(((x.length + 7) / 8 * 8) - x.length)
    }
    pad8(nb); pad8(dt); pad8(ds)
    b.bytes(vb)
    RawMsg(0x000C, b.result)
  }

  // ---- dataset storage -----------------------------------------------

  private sealed trait Stored
  private final case class StoredContiguous(data: Array[Byte])
      extends Stored
  /** chunks in dim-0 order, already filtered; `cRows` = frames per
    * chunk. */
  private final case class StoredChunked(cRows: Int, rank: Int,
      rowElems: Long, elemSize: Int, chunks: Seq[Array[Byte]],
      dims: Seq[Long], shuffle: Boolean) extends Stored

  private def deflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def shuffleBytes(data: Array[Byte], elemSize: Int)
      : Array[Byte] = {
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var byteIdx = 0
    while (byteIdx < elemSize) {
      var i = 0
      while (i < n) {
        out(byteIdx * n + i) = data(i * elemSize + byteIdx)
        i += 1
      }
      byteIdx += 1
    }
    out
  }

  private sealed trait DsKind
  private case object KindF32 extends DsKind
  private case object KindI16 extends DsKind
  private final case class KindStr(len: Int) extends DsKind

  private final case class DatasetSpec(name: String, dims: Seq[Long],
      kind: DsKind, stored: Stored)

  /** Writes the complete file: superblock v0 + root group (attrs +
    * symbol table) + per-dataset object headers, heap/btree/SNOD and
    * data blocks, with addresses back-patched. */
  private def writeFile(path: String, datasets: Seq[DatasetSpec],
      rootAttrs: Seq[(String, String)]): Unit = {
    val b = new Buf
    val sorted = datasets.sortBy(_.name) // SNOD entries are name-ordered

    // --- superblock v0 (96 bytes) ---
    b.bytes(Hdf5Format.Signature)
    b.u8(0) // superblock version
    b.u8(0); b.u8(0); b.u8(0); b.u8(0) // fs / root-group / res / shm
    b.u8(8); b.u8(8) // size of offsets / lengths
    b.u8(0)
    b.u16(4); b.u16(16) // group leaf K / internal K
    b.u32(0) // consistency flags
    b.u64(0) // base address
    b.u64(-1L) // free-space (undefined)
    val eofAt = b.len; b.u64(0) // end-of-file, patched
    b.u64(-1L) // driver info (undefined)
    // root symbol table entry
    b.u64(0) // link name offset
    val rootOhAt = b.len; b.u64(0) // object header address, patched
    b.u32(0); b.u32(0) // cache type 0 (keep scratch unused), reserved
    b.zeros(16)

    // --- local heap data segment ---
    // offset 0 = "" (8 zero bytes), then each name at an 8-aligned
    // offset
    val heapData = new Buf
    heapData.zeros(8)
    val nameOffsets = sorted.map { d =>
      val off = heapData.len.toLong
      val nb = d.name.getBytes("UTF-8") :+ 0.toByte
      heapData.bytes(nb)
      heapData.zeros(((nb.length + 7) / 8 * 8) - nb.length)
      off
    }
    val heapSeg = heapData.result

    // --- dataset object headers + index/data blocks ---
    val dsOhAddrs = sorted.map { d =>
      val addr = b.len.toLong
      val msgs = Vector.newBuilder[RawMsg]
      msgs += RawMsg(0x0001, msgBody(dataspace(_, d.dims)))
      msgs += RawMsg(0x0003, msgBody { t =>
        d.kind match {
          case KindF32 => floatType(t, 4)
          case KindI16 => intType(t, 2)
          case KindStr(len) => strType(t, len)
        }
      })
      d.stored match {
        case StoredContiguous(data) =>
          msgs += RawMsg(0x0008, msgBody { t =>
            t.u8(3); t.u8(1) // v3 contiguous
            t.u64(0) // address, patched after placement
            t.u64(data.length.toLong)
          })
          val built = msgs.result()
          objectHeader(b, built)
          val dataAddr = b.len.toLong
          b.bytes(data)
          patchLayoutAddr(b, addr.toInt, built, dataAddr,
            chunked = false)
        case sc: StoredChunked =>
          msgs += RawMsg(0x0008, msgBody { t =>
            t.u8(3); t.u8(2) // v3 chunked
            t.u8(sc.rank + 1)
            t.u64(0) // b-tree address, patched after placement
            t.u32(sc.cRows.toLong)
            sc.dims.drop(1).foreach(dd => t.u32(dd))
            t.u32(sc.elemSize.toLong)
          })
          msgs += RawMsg(0x000B, msgBody { t =>
            val n = if (sc.shuffle) 2 else 1
            t.u8(1); t.u8(n); t.u16(0); t.u32(0)
            if (sc.shuffle) { // pipeline order: shuffle then deflate
              t.u16(Hdf5Format.FilterShuffle); t.u16(0); t.u16(0)
              t.u16(1); t.u32(sc.elemSize.toLong); t.u32(0)
            }
            t.u16(Hdf5Format.FilterDeflate); t.u16(0); t.u16(0)
            t.u16(1); t.u32(6L); t.u32(0)
          })
          val built = msgs.result()
          objectHeader(b, built)
          // chunk payloads
          val chunkAddrs = sc.chunks.map { c =>
            val a = b.len.toLong; b.bytes(c); a
          }
          // chunk B-tree v1, one leaf
          val btAddr = b.len.toLong
          val rank = sc.rank
          b.bytes("TREE".getBytes("ASCII"))
          b.u8(1); b.u8(0) // node type 1, level 0
          b.u16(sc.chunks.length)
          b.u64(-1L); b.u64(-1L)
          sc.chunks.zipWithIndex.foreach { case (c, i) =>
            b.u32(c.length.toLong); b.u32(0) // stored size, filter mask
            b.u64(i.toLong * sc.cRows)
            (1 until rank).foreach(_ => b.u64(0))
            b.u64(0) // element-size dim offset
            b.u64(chunkAddrs(i))
          }
          // trailing key: first row past the last chunk
          b.u32(0); b.u32(0)
          b.u64(sc.chunks.length.toLong * sc.cRows)
          (1 until rank).foreach(_ => b.u64(0))
          b.u64(0)
          patchLayoutAddr(b, addr.toInt, built, btAddr, chunked = true)
      }
      addr
    }

    // --- group B-tree (one leaf) + SNOD + local heap ---
    val snodAddr = b.len.toLong
    b.bytes("SNOD".getBytes("ASCII"))
    b.u8(1); b.u8(0)
    b.u16(sorted.length)
    sorted.zipWithIndex.foreach { case (_, i) =>
      b.u64(nameOffsets(i))
      b.u64(dsOhAddrs(i))
      b.u32(0); b.u32(0)
      b.zeros(16)
    }
    val btreeAddr = b.len.toLong
    b.bytes("TREE".getBytes("ASCII"))
    b.u8(0); b.u8(0) // type 0, level 0
    b.u16(1)
    b.u64(-1L); b.u64(-1L)
    b.u64(0) // key 0: "" (heap offset 0)
    b.u64(snodAddr)
    b.u64(nameOffsets.last) // key 1: last name in the child
    val heapSegAddr = b.len.toLong
    b.bytes(heapSeg)
    val heapAddr = b.len.toLong
    b.bytes("HEAP".getBytes("ASCII"))
    b.u8(0); b.zeros(3)
    b.u64(heapSeg.length.toLong)
    b.u64(1) // free list: none
    b.u64(heapSegAddr)

    // --- root group object header ---
    val rootOhAddr = b.len.toLong
    val rootMsgs =
      rootAttrs.map { case (k, v) => strAttr(k, v) } :+
        RawMsg(0x0011, msgBody { t => t.u64(btreeAddr); t.u64(heapAddr) })
    objectHeader(b, rootMsgs)

    b.patchU64(rootOhAt, rootOhAddr)
    b.patchU64(eofAt, b.len.toLong)

    val out = FsIO.createStream(path)
    try out.write(b.result) finally out.close()
  }

  /** The layout message's data/b-tree address field position inside a
    * serialized v1 object header is deterministic: 16-byte prefix,
    * then each earlier message is 8 + padded body, then 8-byte message
    * header + 2 bytes (version, class) (+1 dimensionality byte when
    * chunked). */
  private def patchLayoutAddr(b: Buf, ohStart: Int, msgs: Seq[RawMsg],
      addr: Long, chunked: Boolean): Unit = {
    var p = ohStart + 16
    msgs.takeWhile(_.tpe != 0x0008).foreach { m =>
      p += 8 + (m.body.length + 7) / 8 * 8
    }
    p += 8 + 2 + (if (chunked) 1 else 0)
    b.patchU64(p, addr)
  }

  // ---- public profiles -----------------------------------------------

  private def toBytesF32(vals: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vals.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putFloat)
    bb.array()
  }

  private def chunkStore(all: Array[Float], dims: Seq[Long],
      elemSize: Int, cRows: Int, shuffle: Boolean,
      toBytes: Array[Float] => Array[Byte]): StoredChunked = {
    val rowElems = dims.drop(1).product
    val frames = dims.head.toInt
    val chunkVals = (cRows * rowElems).toInt
    val chunks = (0 until frames by cRows).map { f0 =>
      val vals = new Array[Float](chunkVals) // edge chunk zero-padded
      val have = math.min(cRows, frames - f0) * rowElems.toInt
      System.arraycopy(all, (f0 * rowElems).toInt, vals, 0, have)
      val raw = toBytes(vals)
      val sh = if (shuffle) shuffleBytes(raw, elemSize) else raw
      deflate(sh, 6)
    }
    StoredChunked(cRows, dims.length, rowElems, elemSize, chunks, dims,
      shuffle)
  }

  /** mdtraj-convention `.h5`: coordinates chunked+gzip(+shuffle),
    * time / cells contiguous, plus the convention's embedded
    * `topology` dataset when `topologyJson` is given — a one-element
    * fixed-length string array holding mdtraj's topology JSON, the
    * piece that makes a `.h5` trajectory SELF-describing (no `top=`
    * needed on load; [[Hdf5Topology]] reads it back). */
  def write(path: String, frames: Seq[Frame], chunkFrames: Int = 8,
      shuffle: Boolean = false,
      topologyJson: Option[String] = None): Unit = {
    require(frames.nonEmpty, "hdf5 write requires at least one frame")
    val n = frames.head.xyz.length / 3
    require(frames.forall(_.xyz.length == 3 * n),
      "all frames must have the same atom count")
    val withCell = frames.head.cellLengths.isDefined
    require(frames.forall(f => f.cellLengths.isDefined == withCell &&
      f.cellAngles.isDefined == withCell),
      "cell blocks must be all-present or all-absent")
    val fCount = frames.size
    // Bound ASSEMBLY BYTES, not element count: the coords float[] is
    // fCount*n*3*4 bytes and the Buf holds the serialized file on top,
    // so an element-count guard (~8 GB of floats) would OOM long before
    // tripping. Keep the whole file comfortably under the JVM array
    // bound with room for metadata + the stored chunk bytes.
    val coordBytes = fCount.toLong * n * 3 * 4
    require(coordBytes * 2 + (1L << 20) <= Int.MaxValue - 8,
      s"hdf5 write: $fCount frames x $n atoms is $coordBytes coordinate " +
        "bytes; the single-file in-memory assembly bound is ~1 GB — " +
        "shard the write")
    val coords = new Array[Float](fCount * n * 3)
    frames.zipWithIndex.foreach { case (f, i) =>
      System.arraycopy(f.xyz, 0, coords, i * n * 3, n * 3)
    }
    val coordDims = Seq(fCount.toLong, n.toLong, 3L)
    val specs = Vector.newBuilder[DatasetSpec]
    specs += DatasetSpec("coordinates", coordDims, KindF32,
      chunkStore(coords, coordDims, 4, math.min(chunkFrames, fCount),
        shuffle, toBytesF32))
    specs += DatasetSpec("time", Seq(fCount.toLong), KindF32,
      StoredContiguous(toBytesF32(frames.map(_.time).toArray)))
    if (withCell) {
      specs += DatasetSpec("cell_lengths", Seq(fCount.toLong, 3L),
        KindF32,
        StoredContiguous(toBytesF32(frames.flatMap(_.cellLengths.get)
          .toArray)))
      specs += DatasetSpec("cell_angles", Seq(fCount.toLong, 3L),
        KindF32,
        StoredContiguous(toBytesF32(frames.flatMap(_.cellAngles.get)
          .toArray)))
    }
    topologyJson.foreach { json =>
      val jb = json.getBytes("UTF-8")
      specs += DatasetSpec("topology", Seq(1L), KindStr(jb.length),
        StoredContiguous(jb))
    }
    writeFile(path, specs.result(), Seq(
      "conventions" -> "Pande",
      "conventionVersion" -> "1.1",
      "program" -> "graft",
      "programVersion" -> "12",
      "title" -> "graft trajectory"))
  }

  /** Legacy MSMBuilder `.lh5`: XYZList int16 = round(nm × 1000),
    * chunked+gzip. */
  def writeLh5(path: String, frames: Seq[Frame], chunkFrames: Int = 8)
      : Unit = {
    require(frames.nonEmpty, "lh5 write requires at least one frame")
    val n = frames.head.xyz.length / 3
    require(frames.forall(_.xyz.length == 3 * n),
      "all frames must have the same atom count")
    val fCount = frames.size
    val lh5Bytes = fCount.toLong * n * 3 * 4
    require(lh5Bytes * 2 + (1L << 20) <= Int.MaxValue - 8,
      s"lh5 write: $fCount frames x $n atoms is $lh5Bytes staging " +
        "bytes; the single-file in-memory assembly bound is ~1 GB — " +
        "shard the write")
    val dims = Seq(fCount.toLong, n.toLong, 3L)
    val all = new Array[Float](fCount * n * 3)
    frames.zipWithIndex.foreach { case (f, i) =>
      System.arraycopy(f.xyz, 0, all, i * n * 3, n * 3)
    }
    def toI16Bytes(vals: Array[Float]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vals.length * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach { v =>
        val q = math.round(v * 1000.0f)
        require(q >= Short.MinValue && q <= Short.MaxValue,
          s"lh5 write: coordinate $v nm overflows the int16×1000 " +
            "lossy encoding")
        bb.putShort(q.toShort)
      }
      bb.array()
    }
    val stored = chunkStore(all, dims, 2,
      math.min(chunkFrames, fCount), shuffle = false, toI16Bytes)
    writeFile(path, Seq(DatasetSpec("XYZList", dims, KindI16,
      stored)), Nil)
  }
}
