package graft

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.{DcdWrite, FsIO}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Test-only FileSystem registered under the `graftfs:` scheme — a
  * RawLocalFileSystem that answers to a non-`file:` URI, standing in
  * for HDFS/S3A so the cluster-I/O layer is exercised through scheme
  * resolution (`fs.graftfs.impl`) rather than the local default. */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")

  /** Conf value captured at initialize time — lets the cache-semantics
    * test observe WHICH configuration an instance was created from. */
  @volatile var confMarker: String = "unset"
  override def initialize(uri: URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    confMarker = conf.get("graft.fsio.conf.marker", "unset")
  }
}

/** The cluster-I/O layer ([[graft.sources.FsIO]]) under a NON-`file:`
  * Hadoop scheme, plus the two FsIO policies the sources depend on:
  * no local checksum sidecars, and `spark.hadoop.*` visibility on
  * session-less executor threads. */
class FsIOSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    s
  }

  private def graftUri(localAbs: String): String = "graftfs://" + localAbs

  test("non-file: scheme: mkdirs / writeBytes / exists / length / " +
    "list / glob resolve through fs.graftfs.impl") {
    val dir = graftUri(Files.createTempDirectory("fsio").toString)
    spark // force scheme registration
    FsIO.mkdirs(FsIO.child(dir, "sub"))
    assert(FsIO.isDirectory(FsIO.child(dir, "sub")))
    val payload = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    FsIO.writeBytes(FsIO.child(dir, "a.bin"), payload)
    FsIO.writeString(FsIO.child(dir, "b.txt"), "l1\nl2\n")
    assert(FsIO.exists(FsIO.child(dir, "a.bin")))
    assert(FsIO.isFile(FsIO.child(dir, "a.bin")))
    assert(FsIO.length(FsIO.child(dir, "a.bin")) == 64L)
    val names = FsIO.list(dir).map(_.name)
    assert(names == Seq("a.bin", "b.txt", "sub"))
    // listed paths keep the scheme (executors re-open them by string)
    assert(FsIO.list(dir).forall(_.path.startsWith("graftfs:")))
    assert(FsIO.globFiles(dir, "*.bin").map(FsIO.fileName) == Seq("a.bin"))
    assert(FsIO.readLines(FsIO.child(dir, "b.txt")) == Seq("l1", "l2"))
    assert(FsIO.readAllBytes(FsIO.child(dir, "a.bin")).toSeq ==
      payload.toSeq)
  }

  test("non-file: scheme: FsRandom positioned reads are byte-exact " +
    "(seek / readFully / getFilePointer / length)") {
    val dir = graftUri(Files.createTempDirectory("fsio-rand").toString)
    spark
    val payload = Array.tabulate[Byte](256)(i => (i ^ 0x5a).toByte)
    val p = FsIO.child(dir, "r.bin")
    FsIO.writeBytes(p, payload)
    val r = FsIO.openRandom(p)
    try {
      assert(r.length() == 256L)
      r.seek(100L)
      val buf = new Array[Byte](16)
      r.readFully(buf)
      assert(buf.toSeq == payload.slice(100, 116).toSeq)
      assert(r.getFilePointer == 116L)
      r.seek(3L) // backwards seek must work too
      r.readFully(buf, 0, 4)
      assert(buf.take(4).toSeq == payload.slice(3, 7).toSeq)
    } finally r.close()
  }

  test("non-file: scheme: rename moves the committed artifact") {
    val dir = graftUri(Files.createTempDirectory("fsio-mv").toString)
    spark
    val tmp = FsIO.child(dir, "_tmp")
    FsIO.writeString(tmp, "x")
    FsIO.rename(tmp, FsIO.child(dir, "done"))
    assert(!FsIO.exists(tmp) && FsIO.exists(FsIO.child(dir, "done")))
  }

  test("binary format round-trip over the non-file: scheme: dcd " +
    "write + DSv2 scan through graftfs:// match the local read") {
    val dir = Files.createTempDirectory("fsio-dcd")
    spark
    val frames = (0 until 4).map { f =>
      val xs = Array.tabulate(3)(a => (f * 10 + a).toFloat)
      DcdWrite.Frame(xs, xs.map(_ + 0.25f), xs.map(_ + 0.5f),
        Some((6.0, 7.0, 8.0, 90.0, 90.0, 90.0)))
    }
    val local = dir.resolve("t.dcd").toString
    DcdWrite.write(graftUri(local), frames, istart = 0, nsavc = 2,
      delta = 0.5f)
    // the bytes landed on disk (same store, different scheme)
    assert(Files.exists(dir.resolve("t.dcd")))
    val viaScheme = spark.read.format("dcd").load(graftUri(local))
      .select("frame_id", "atom_id", "x", "y", "z", "box_a")
    val viaLocal = spark.read.format("dcd").load(local)
      .select("frame_id", "atom_id", "x", "y", "z", "box_a")
    assert(viaScheme.count() == 12)
    assert(viaScheme.collect().map(_.toSeq).toSet ==
      viaLocal.collect().map(_.toSeq).toSet)
  }

  test("checksum policy: no .crc sidecars next to writer output or " +
    "in a DSv2 write directory") {
    spark
    // direct writer path
    val d1 = Files.createTempDirectory("fsio-crc1")
    DcdWrite.write(d1.resolve("t.dcd").toString,
      Seq(DcdWrite.Frame(Array(1f), Array(2f), Array(3f), None)))
    val names1 = FsIO.list(d1.toString).map(_.name)
    assert(names1 == Seq("t.dcd"),
      s"expected only the data file, got $names1")
    // DSv2 write path (gro shard writer)
    val d2 = Files.createTempDirectory("fsio-crc2").toString
    val df = spark.read.format("dcd")
      .load(d1.resolve("t.dcd").toString)
      .withColumn("res_id", lit(1))
      .withColumn("res_name", lit("RES"))
      .withColumn("atom_name", lit("C"))
    val nullF = lit(null).cast("float")
    val bv = Seq("bv1x", "bv1y", "bv1z", "bv2x", "bv2y", "bv2z",
      "bv3x", "bv3y", "bv3z").map(n => nullF.as(n))
    val out = df.select(Seq(col("frame_id"), col("time"),
      col("atom_id"), col("res_id"), col("res_name"),
      col("atom_name"), col("x"), col("y"), col("z")) ++ bv: _*)
    out.write.format("gro").mode("overwrite").save(d2)
    val names2 = FsIO.list(d2).map(_.name)
    assert(names2.nonEmpty)
    assert(!names2.exists(_.endsWith(".crc")),
      s"checksum sidecars leaked into DSv2 output: $names2")
  }

  test("out-of-band edits surface the format's own error contract, " +
    "not a ChecksumException (stale-sidecar regression guard)") {
    spark
    val d = Files.createTempDirectory("fsio-oob")
    val p = d.resolve("t.dcd")
    DcdWrite.write(p.toString,
      Seq(DcdWrite.Frame(Array(1f), Array(2f), Array(3f), None)))
    // corrupt the header magic out-of-band, as a user's tool would
    val bytes = Files.readAllBytes(p)
    bytes(4) = 'X'
    Files.write(p, bytes)
    val e = intercept[Exception] {
      spark.read.format("dcd").load(p.toString).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(!chain(e).exists(
      _.isInstanceOf[org.apache.hadoop.fs.ChecksumException]),
      s"got a checksum error instead of the DCD contract: $e")
  }

  test("micro-batch streaming reads shard directories through the " +
    "non-file: scheme (cluster landing-dir posture)") {
    spark
    val dir = Files.createTempDirectory("fsio-stream")
    def shard(i: Int): Unit =
      Files.writeString(dir.resolve(f"s$i%03d.xyz"),
        s"1\n# Step: $i\nC 1.0 2.0 3.0\n")
    shard(0)
    val q = spark.readStream.format("xyz").load(graftUri(dir.toString))
      .writeStream.format("memory").queryName("graftfs_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graftfs_stream").count() == 1)
      shard(1)
      q.processAllAvailable()
      assert(spark.table("graftfs_stream").count() == 2)
    } finally q.stop()
  }

  test("checksum policy is SCOPED to FsIO instances: the JVM-shared " +
    "FileSystem.get local FS still writes AND verifies CRC sidecars") {
    spark
    val d = Files.createTempDirectory("fsio-scope")
    // touch FsIO first so any shared-instance mutation would already
    // have happened before we inspect the shared FS
    FsIO.writeString(d.resolve("via-fsio.txt").toString, "fsio")
    assert(!Files.exists(d.resolve(".via-fsio.txt.crc")),
      "FsIO's own write must not produce a sidecar")
    val shared = org.apache.hadoop.fs.FileSystem
      .get(URI.create("file:///"), FsIO.conf)
    assert(shared ne FsIO.fs(d.toString),
      "FsIO must hold a private instance, not the shared one")
    val sp = new org.apache.hadoop.fs.Path(
      d.resolve("via-shared.txt").toString)
    val out = shared.create(sp, true)
    out.write("shared".getBytes(StandardCharsets.UTF_8)); out.close()
    // shared FS still WRITES the sidecar...
    assert(Files.exists(d.resolve(".via-shared.txt.crc")),
      "shared local FS lost checksum writing — policy leaked")
    // ...and still VERIFIES it: same-length out-of-band corruption
    Files.write(d.resolve("via-shared.txt"),
      "sXared".getBytes(StandardCharsets.UTF_8))
    intercept[org.apache.hadoop.fs.ChecksumException] {
      val in = shared.open(sp)
      try { val buf = new Array[Byte](6); in.readFully(buf) }
      finally in.close()
    }
    // while the FsIO handle reads the same bytes undisturbed
    assert(new String(
      FsIO.readAllBytes(d.resolve("via-shared.txt").toString),
      StandardCharsets.UTF_8) == "sXared")
  }

  test("instance-cache semantics: conf changes after first access " +
    "reach FsIO only via invalidate()") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.fsio.conf.marker", "m1")
    try {
      FsIO.invalidate() // drop instances from earlier tests/suites
      def marker(): String =
        FsIO.fs("graftfs:///tmp").asInstanceOf[GraftTestFs].confMarker
      assert(marker() == "m1")
      hc.set("graft.fsio.conf.marker", "m2")
      // pinned: a held instance does NOT see later conf changes
      // (same visibility rule as Hadoop's own FileSystem cache)
      assert(marker() == "m1")
      FsIO.invalidate()
      assert(marker() == "m2")
    } finally {
      hc.unset("graft.fsio.conf.marker")
      FsIO.invalidate()
    }
  }

  test("executor conf: spark.hadoop.* reaches FsIO on a session-less " +
    "thread via SparkEnv (cluster partition-reader posture)") {
    spark
    SparkEnv.get.conf.set("spark.hadoop.graft.test.marker", "sentinel")
    try {
      val seen = spark.sparkContext.parallelize(Seq(1), 1).map { _ =>
        // simulate a real executor JVM: no active/default session
        val savedDefault = SparkSession.getDefaultSession
        val savedActive = SparkSession.getActiveSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        try FsIO.conf.get("graft.test.marker", "MISSING")
        finally {
          savedDefault.foreach(SparkSession.setDefaultSession)
          savedActive.foreach(SparkSession.setActiveSession)
        }
      }.collect()(0)
      assert(seen == "sentinel")
    } finally SparkEnv.get.conf.remove("spark.hadoop.graft.test.marker")
  }
}
