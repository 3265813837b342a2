package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

import graft.sources.{FsIO, Hdf5Format}
import org.scalatest.funsuite.AnyFunSuite

/** Structural oracle for the clean-room HDF5 parser: two complete
  * files are laid out BYTE BY BYTE in this spec, every block address
  * hand-computed from the public HDF5 File Format Specification —
  * independent of both [[graft.sources.Hdf5Write]] and the parser
  * under test (the XTC suite's fixture discipline: self-round-trip
  * alone is not evidence).
  *
  * Golden file 1 — the pytables/mdtraj layout: superblock v0 at 0,
  * version-1 object headers, old-style root group (B-tree v1 + local
  * heap + SNOD), two contiguous float32 datasets. Hand-computed map:
  * {{{
  * 0    superblock v0 (96 B)      root OH addr field at byte 64
  * 96   root group object header  1 msg: symbol table (btree, heap)
  * 136  group B-tree leaf (48 B)  1 child → SNOD at 184
  * 184  SNOD (8 + 2×40 B)         coordinates → 336, time → 456
  * 272  local heap header (32 B)  data segment at 304, length 32
  * 304  heap data: 0:"" 8:"coordinates" 24:"time"
  * 336  "coordinates" OH          dataspace [2,2,3] f32 contiguous
  * 456  "time" OH                 dataspace [2] f32 contiguous
  * 560  coordinates data (48 B)   value = 100·frame + 10·atom + axis
  * 608  time data (8 B)           0.5, 1.5
  * 616  EOF
  * }}}
  *
  * Golden file 2 — the newer-libhdf5 layout: superblock v2, OHDR
  * version-2 object headers, compact link message.
  */
class Hdf5FormatSpec extends AnyFunSuite {

  private def writeTemp(bytes: Array[Byte], suffix: String): Path = {
    val f = Files.createTempFile("h5golden", suffix)
    Files.write(f, bytes)
    f
  }

  /** Golden file 1: 616 bytes, addresses as mapped above. */
  private def goldenV0: Array[Byte] = {
    val b = ByteBuffer.allocate(616).order(ByteOrder.LITTLE_ENDIAN)

    // --- 0: superblock version 0 ---
    b.put(Hdf5Format.Signature) // 0..8
    b.put(0.toByte) // 8: superblock version
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // 9-11
    b.put(0.toByte) // 12: shared header version
    b.put(8.toByte); b.put(8.toByte) // 13,14: offset/length sizes
    b.put(0.toByte) // 15
    b.putShort(4); b.putShort(16) // 16,18: group leaf / internal K
    b.putInt(0) // 20: consistency flags
    b.putLong(0L) // 24: base address
    b.putLong(-1L) // 32: free-space address (undefined)
    b.putLong(616L) // 40: end-of-file address
    b.putLong(-1L) // 48: driver info (undefined)
    b.putLong(0L) // 56: root link name offset
    b.putLong(96L) // 64: ROOT OBJECT HEADER ADDRESS
    b.putInt(0); b.putInt(0) // 72,76: cache type, reserved
    b.position(96) // 80..96: scratch

    // --- 96: root group object header (v1) ---
    b.put(1.toByte); b.put(0.toByte) // version, reserved
    b.putShort(1) // number of messages
    b.putInt(1) // reference count
    b.putInt(24) // header size (one 8+16 message)
    b.position(112) // 4 alignment bytes
    b.putShort(0x0011); b.putShort(16); b.putInt(0) // symbol table msg
    b.putLong(136L) // group B-tree address
    b.putLong(272L) // local heap address

    // --- 136: group B-tree v1, leaf, one child ---
    b.put("TREE".getBytes("ASCII"))
    b.put(0.toByte); b.put(0.toByte) // node type 0, level 0
    b.putShort(1) // entries used
    b.putLong(-1L); b.putLong(-1L) // siblings
    b.putLong(0L) // key 0: heap offset of ""
    b.putLong(184L) // child 0: SNOD
    b.putLong(24L) // key 1: heap offset of "time" (last name)

    // --- 184: SNOD with the two (name-ordered) datasets ---
    b.put("SNOD".getBytes("ASCII"))
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(2)
    b.putLong(8L); b.putLong(336L) // "coordinates" → OH at 336
    b.putInt(0); b.putInt(0); b.position(b.position() + 16)
    b.putLong(24L); b.putLong(456L) // "time" → OH at 456
    b.putInt(0); b.putInt(0); b.position(b.position() + 16)

    // --- 272: local heap header ---
    b.put("HEAP".getBytes("ASCII"))
    b.put(0.toByte); b.position(280) // version + 3 reserved
    b.putLong(32L) // data segment length
    b.putLong(1L) // free list: none
    b.putLong(304L) // data segment address

    // --- 304: heap data ---
    b.position(312) // offset 0: "" (8 zero bytes)
    b.put("coordinates".getBytes("ASCII")); b.put(0.toByte) // offset 8
    b.position(328) // pad to 8-aligned
    b.put("time".getBytes("ASCII")); b.put(0.toByte) // offset 24
    b.position(336)

    def float32Type(): Unit = { // class 1 v1, IEEE single LE: 20 B body
      b.put(0x11.toByte)
      b.put(0x20.toByte); b.put(31.toByte); b.put(0.toByte)
      b.putInt(4)
      b.putShort(0); b.putShort(32) // bit offset, precision
      b.put(23.toByte); b.put(8.toByte) // exponent location, size
      b.put(0.toByte); b.put(23.toByte) // mantissa location, size
      b.putInt(127) // exponent bias
    }

    // --- 336: "coordinates" object header ---
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(3)
    b.putInt(1)
    b.putInt(104) // (8+32) + (8+24) + (8+24)
    b.position(352)
    b.putShort(0x0001); b.putShort(32); b.putInt(0) // dataspace [2,2,3]
    b.put(1.toByte); b.put(3.toByte); b.put(0.toByte) // v1, rank 3
    b.position(b.position() + 5)
    b.putLong(2L); b.putLong(2L); b.putLong(3L)
    b.putShort(0x0003); b.putShort(24); b.putInt(0) // datatype (20→24)
    float32Type(); b.position(b.position() + 4)
    b.putShort(0x0008); b.putShort(24); b.putInt(0) // layout (18→24)
    b.put(3.toByte); b.put(1.toByte) // v3 contiguous
    b.putLong(560L) // DATA ADDRESS
    b.putLong(48L) // data size
    b.position(456)

    // --- 456: "time" object header ---
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(3)
    b.putInt(1)
    b.putInt(88) // (8+16) + (8+24) + (8+24)
    b.position(472)
    b.putShort(0x0001); b.putShort(16); b.putInt(0) // dataspace [2]
    b.put(1.toByte); b.put(1.toByte); b.put(0.toByte)
    b.position(b.position() + 5)
    b.putLong(2L)
    b.putShort(0x0003); b.putShort(24); b.putInt(0)
    float32Type(); b.position(b.position() + 4)
    b.putShort(0x0008); b.putShort(24); b.putInt(0)
    b.put(3.toByte); b.put(1.toByte)
    b.putLong(608L)
    b.putLong(8L)
    b.position(560)

    // --- 560: coordinates values, 608: times ---
    for (f <- 0 until 2; a <- 0 until 2; ax <- 0 until 3)
      b.putFloat(100f * f + 10f * a + ax)
    b.putFloat(0.5f); b.putFloat(1.5f)

    assert(b.position() == 616)
    b.array()
  }

  test("golden superblock-v0 file (hand-laid pytables layout) parses: " +
    "both datasets found with dims, type, layout address") {
    val p = writeTemp(goldenV0, ".h5")
    val raf = FsIO.openRandom(p.toString)
    try {
      val f = Hdf5Format.parse(raf, p.toString)
      assert(f.datasets.keySet == Set("coordinates", "time"))
      val c = f.datasets("coordinates")
      assert(c.dims.toSeq == Seq(2L, 2L, 3L))
      assert(c.dtype == Hdf5Format.FloatT(4, be = false))
      assert(c.layout == Hdf5Format.Contiguous(560L, 48L))
      assert(f.datasets("time").dims.toSeq == Seq(2L))

      val slab = new Hdf5Format.SlabReader(raf, p.toString, c)
        .readSlab(1, 2)
      assert(slab.length == 6)
      assert(slab(0) == 100.0 && slab(3) == 110.0 && slab(5) == 112.0)
      val t = new Hdf5Format.SlabReader(raf, p.toString,
        f.datasets("time")).readSlab(0, 2)
      assert(t.toSeq == Seq(0.5, 1.5))
    } finally raf.close()
  }

  test("golden v0 file reads through the full DSv2 path with the " +
    "planted closed-form values") {
    val p = writeTemp(goldenV0, ".h5")
    val spark = SparkTestBase.spark
    val rows = spark.read.format("hdf5").load(p.toString)
      .orderBy("frame_id", "atom_id").collect()
    assert(rows.length == 4)
    val r = rows(3) // frame 1, atom 1
    assert(r.getAs[Long]("frame_id") == 1L)
    assert(r.getAs[Int]("atom_id") == 1)
    assert(r.getAs[Float]("x") == 110.0f)
    assert(r.getAs[Float]("y") == 111.0f)
    assert(r.getAs[Float]("z") == 112.0f)
    assert(r.getAs[Double]("time") == 1.5)
    assert(r.isNullAt(r.fieldIndex("box_a"))) // no cell datasets
  }

  /** Golden file 2: superblock v2 + OHDR v2 + compact link message.
    * Map: 0 superblock (48 B), 48 root OHDR (30 B), 78 dataset OHDR
    * (73 B), 151 data (12 B), 163 EOF. */
  private def goldenV2: Array[Byte] = {
    val b = ByteBuffer.allocate(163).order(ByteOrder.LITTLE_ENDIAN)

    // --- 0: superblock version 2 ---
    b.put(Hdf5Format.Signature)
    b.put(2.toByte) // version
    b.put(8.toByte); b.put(8.toByte) // offset / length sizes
    b.put(0.toByte) // consistency flags
    b.putLong(0L) // base address
    b.putLong(-1L) // superblock extension
    b.putLong(163L) // end of file
    b.putLong(48L) // ROOT OBJECT HEADER ADDRESS
    b.putInt(0) // checksum (not verified by the parser)

    // --- 48: root OHDR v2: one hard-link message "dset" → 78 ---
    b.put("OHDR".getBytes("ASCII"))
    b.put(2.toByte) // version
    b.put(0.toByte) // flags: 1-byte chunk0 size, no times
    b.put(19.toByte) // size of chunk 0
    // link message: type 0x06, 15-byte body
    b.put(0x06.toByte); b.putShort(15); b.put(0.toByte)
    b.put(1.toByte) // link version
    b.put(0.toByte) // link flags: 1-byte name length, hard link
    b.put(4.toByte) // name length
    b.put("dset".getBytes("ASCII"))
    b.putLong(78L) // object header address
    b.putInt(0) // OHDR checksum (not verified)

    // --- 78: dataset OHDR v2 ---
    b.put("OHDR".getBytes("ASCII"))
    b.put(2.toByte); b.put(0.toByte)
    b.put(62.toByte) // chunk 0: (4+12) + (4+20) + (4+18)
    b.put(0x01.toByte); b.putShort(12); b.put(0.toByte) // dataspace v2
    b.put(2.toByte); b.put(1.toByte) // version 2, rank 1
    b.put(0.toByte); b.put(1.toByte) // flags, type: simple
    b.putLong(3L)
    b.put(0x03.toByte); b.putShort(20); b.put(0.toByte) // datatype
    b.put(0x11.toByte)
    b.put(0x20.toByte); b.put(31.toByte); b.put(0.toByte)
    b.putInt(4)
    b.putShort(0); b.putShort(32)
    b.put(23.toByte); b.put(8.toByte); b.put(0.toByte); b.put(23.toByte)
    b.putInt(127)
    b.put(0x08.toByte); b.putShort(18); b.put(0.toByte) // layout v3
    b.put(3.toByte); b.put(1.toByte)
    b.putLong(151L) // DATA ADDRESS
    b.putLong(12L)
    b.putInt(0) // OHDR checksum

    // --- 151: data ---
    b.putFloat(1.25f); b.putFloat(-2.5f); b.putFloat(3.75f)
    assert(b.position() == 163)
    b.array()
  }

  test("golden superblock-v2 file (OHDR v2 + compact link) parses " +
    "and reads the planted values") {
    val p = writeTemp(goldenV2, ".h5")
    val raf = FsIO.openRandom(p.toString)
    try {
      val f = Hdf5Format.parse(raf, p.toString)
      assert(f.datasets.keySet == Set("dset"))
      val d = f.datasets("dset")
      assert(d.dims.toSeq == Seq(3L))
      assert(d.layout == Hdf5Format.Contiguous(151L, 12L))
      val v = new Hdf5Format.SlabReader(raf, p.toString, d).readSlab(0, 3)
      assert(v.toSeq == Seq(1.25, -2.5, 3.75))
    } finally raf.close()
  }

  test("user-block file: the same golden bytes behind a 512-byte user " +
    "block parse identically — every stored address is base-relative") {
    // per the spec the superblock may sit at any power-of-two offset
    // ≥ 512; ALL file addresses (layout data, chunk B-tree children,
    // continuations included) are then relative to that base. The
    // golden file's stored addresses are unchanged — only the
    // superblock moves.
    val shifted = new Array[Byte](512 + 616)
    System.arraycopy(goldenV0, 0, shifted, 512, 616)
    val p = writeTemp(shifted, ".h5")
    val raf = FsIO.openRandom(p.toString)
    try {
      val f = Hdf5Format.parse(raf, p.toString)
      assert(f.datasets.keySet == Set("coordinates", "time"))
      val c = f.datasets("coordinates")
      // base-resolved: 512 + the stored 560
      assert(c.layout == Hdf5Format.Contiguous(512L + 560L, 48L))
      val slab = new Hdf5Format.SlabReader(raf, p.toString, c)
        .readSlab(0, 1)
      assert(slab(0) == 0.0 && slab(4) == 11.0)
    } finally raf.close()
    // and through the DSv2 path
    val spark = SparkTestBase.spark
    val rows = spark.read.format("hdf5").load(p.toString)
      .orderBy("frame_id", "atom_id").collect()
    assert(rows.length == 4)
    assert(rows(3).getAs[Float]("z") == 112.0f)
  }

  test("fletcher32 matches the hand-computed value on a 2-byte input " +
    "and survives the odd-length zero-pad rule") {
    // one 16-bit BE word 0x0102: sum1 = sum2 = 0x0102
    assert(Hdf5Format.fletcher32(Array[Byte](1, 2)) == 0x01020102)
    // odd length: trailing byte high-padded → word 0x0500
    val odd = Hdf5Format.fletcher32(Array[Byte](5))
    assert(odd == ((0x0500 << 16) | 0x0500))
  }

  test("fletcher32 uses ones'-complement folding, not mod 65535 — a " +
    "running sum at exactly 65535 keeps 0xFFFF as libhdf5 does") {
    // single word 0xFFFF: sum1 = sum2 = 65535. HDF5's fold-with-carry
    // keeps 0xFFFF; a mod-65535 reduction would zero both and reject
    // any libhdf5-written chunk whose sums land on a multiple of 65535.
    val one = Hdf5Format.fletcher32(Array[Byte](0xFF.toByte, 0xFF.toByte))
    assert(one == 0xFFFFFFFF)
    // two words 0xFFFF 0x0001: sum1 = 65536+... check against a direct
    // ones'-complement reference model
    def ref(words: Seq[Int]): Int = {
      def fold(x: Long): Long = {
        var v = x; while ((v >>> 16) != 0) v = (v & 0xFFFF) + (v >>> 16); v
      }
      var s1 = 0L; var s2 = 0L
      words.foreach { w => s1 += w; s2 += s1 }
      ((fold(s2) << 16) | fold(s1)).toInt
    }
    val data = Array[Byte](0xFF.toByte, 0xFF.toByte, 0, 1)
    assert(Hdf5Format.fletcher32(data) == ref(Seq(0xFFFF, 0x0001)))
    // long pseudo-random buffer: engine vs reference model agree word
    // for word (exercises the periodic in-loop fold too)
    val rnd = new scala.util.Random(42)
    val big = Array.fill[Byte](200000)(rnd.nextInt(256).toByte)
    val words = big.grouped(2).map(p =>
      ((p(0) & 0xFF) << 8) | (p(1) & 0xFF)).toSeq
    assert(Hdf5Format.fletcher32(big) == ref(words))
  }

  test("defilter undoes shuffle+deflate in reverse pipeline order and " +
    "verifies fletcher32") {
    val raw = Array.tabulate[Byte](24)(i => (i * 7 + 1).toByte)
    // forward: shuffle(elem=4) then deflate — as a writer would
    val n = raw.length / 4
    val shuffled = new Array[Byte](raw.length)
    for (bI <- 0 until 4; i <- 0 until n)
      shuffled(bI * n + i) = raw(i * 4 + bI)
    val d = new java.util.zip.Deflater()
    d.setInput(shuffled); d.finish()
    val out = new Array[Byte](256)
    val m = d.deflate(out)
    d.end()
    val stored = java.util.Arrays.copyOf(out, m)
    val filters = Seq(
      Hdf5Format.Filter(Hdf5Format.FilterShuffle, Array(4)),
      Hdf5Format.Filter(Hdf5Format.FilterDeflate, Array(6)))
    val back = Hdf5Format.defilter("t", stored, filters, mask = 0,
      elemSize = 4, expectBytes = raw.length)
    assert(back.toSeq == raw.toSeq)

    // fletcher32 last in pipeline → first undone; checksum appended
    val sum = Hdf5Format.fletcher32(raw)
    val withSum = ByteBuffer.allocate(raw.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN).put(raw).putInt(sum).array()
    val f2 = Seq(Hdf5Format.Filter(Hdf5Format.FilterFletcher32, Array()))
    assert(Hdf5Format.defilter("t", withSum, f2, 0, 1,
      raw.length).toSeq == raw.toSeq)
    val corrupt = withSum.clone(); corrupt(3) = (corrupt(3) + 1).toByte
    val e = intercept[IllegalArgumentException] {
      Hdf5Format.defilter("t", corrupt, f2, 0, 1, raw.length)
    }
    assert(e.getMessage.contains("fletcher32"))
  }

  test("shuffle defilter unshuffles the n*sz body and passes a " +
    "trailing remainder through verbatim (H5Zshuffle semantics)") {
    // 10 bytes, elem size 4 → body 8 unshuffled, last 2 verbatim
    val raw = Array.tabulate[Byte](10)(i => (i + 1).toByte)
    val n = 2 // 8-byte body / 4
    val shuffled = new Array[Byte](10)
    for (bI <- 0 until 4; i <- 0 until n)
      shuffled(bI * n + i) = raw(i * 4 + bI)
    shuffled(8) = raw(8); shuffled(9) = raw(9)
    val fs = Seq(Hdf5Format.Filter(Hdf5Format.FilterShuffle, Array(4)))
    val back = Hdf5Format.defilter("t", shuffled, fs, 0, 4, 10)
    assert(back.toSeq == raw.toSeq)
  }

  test("non-HDF5 bytes and unsupported features fail with clear " +
    "messages") {
    val notH5 = writeTemp("CDFgarbagegarbage".getBytes, ".h5")
    val raf = FsIO.openRandom(notH5.toString)
    try {
      val e = intercept[IllegalArgumentException] {
        Hdf5Format.parse(raf, notH5.toString)
      }
      assert(e.getMessage.contains("signature"))
    } finally raf.close()

    // corrupt the golden file's layout version to 4 → clear message
    val bad = goldenV0
    // 336 OH + 16 prefix + 40 (dataspace msg) + 32 (datatype msg) +
    // 8 (layout msg header) = byte 432 is the layout version
    assert(bad(432) == 3)
    bad(432) = 4
    val p2 = writeTemp(bad, ".h5")
    val raf2 = FsIO.openRandom(p2.toString)
    try {
      val e2 = intercept[IllegalArgumentException] {
        Hdf5Format.parse(raf2, p2.toString)
      }
      assert(e2.getMessage.contains("chunk index"))
    } finally raf2.close()
  }
}
