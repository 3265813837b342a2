package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Reader for the mdtraj HDF5 convention's EMBEDDED topology: an
  * mdtraj `.h5` trajectory carries its own topology as a one-element
  * string dataset named `topology` holding a JSON document
  * (`{"chains": [{"index", "residues": [{"name", "resSeq",
  * "atoms": [{"index", "name", "element"}]}]}], "bonds": [...]}`), so
  * `load("traj.h5")` is SELF-describing — the reference inherits
  * mdtraj's behavior of needing no `top=` for this format
  * (core/dask_traj.py:61,80-83 passes `top` through to mdtraj, which
  * ignores it for .h5). This reads the JSON off the clean-room
  * container parser and emits the same atom-dimension schema as
  * [[PdbTopology.topology]] — `(atom_id, name, res_name, chain,
  * res_seq, element, mass)` with IUPAC masses — so
  * `TrajQueries.comOfLoaded` runs unchanged on either source.
  *
  * JSON parsing uses Jackson (on every Spark classpath); topologies
  * are small driver-side metadata, same contract as the PDB parser. */
object Hdf5Topology {

  /** Raw embedded topology JSON, or a clear error when the file has
    * none (e.g. `.lh5`, which predates the convention). */
  def topologyJson(path: String): String = {
    val raf = FsIO.openRandom(path)
    try {
      val f = Hdf5Format.parse(raf, path)
      val ds = f.datasets.getOrElse("topology",
        Hdf5Format.fail(path, "no embedded 'topology' dataset — this " +
          "file predates the mdtraj convention (or is a legacy .lh5); " +
          "pass an external topology instead"))
      ds.dtype match {
        case Hdf5Format.Opaque(_, 9) => Hdf5Format.fail(path,
          "topology is a VARIABLE-length string dataset (h5py-style, " +
            "global-heap backed) — only the fixed-length string shape " +
            "mdtraj/pytables write is supported")
        case _ => ()
      }
      val bytes = ds.layout match {
        case Hdf5Format.Contiguous(addr, n) =>
          if (n > 256L * 1024 * 1024)
            Hdf5Format.fail(path, s"topology dataset of $n bytes")
          val b = new Array[Byte](n.toInt)
          raf.seek(addr)
          raf.readFully(b)
          b
        case Hdf5Format.Compact(d) => d
        case _ => Hdf5Format.fail(path,
          "chunked topology dataset is not supported (every writer " +
            "stores the one-element JSON string contiguous)")
      }
      // fixed-length string datasets NUL-pad short values
      var end = bytes.length
      while (end > 0 && bytes(end - 1) == 0) end -= 1
      new String(bytes, 0, end, "UTF-8")
    } finally raf.close()
  }

  private val Schema = StructType(Seq(
    StructField("atom_id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("res_name", StringType, nullable = false),
    StructField("chain", StringType, nullable = false),
    StructField("res_seq", IntegerType, nullable = false),
    StructField("element", StringType, nullable = false),
    StructField("mass", DoubleType, nullable = false)))

  /** The atom dimension from the embedded JSON — broadcast-joinable
    * onto the trajectory's `atom_id` exactly like the PDB topology.
    * Chain indices render as letters (A, B, ...) for parity with the
    * PDB chain column. */
  def topology(spark: SparkSession, path: String): DataFrame = {
    val root = new ObjectMapper().readTree(topologyJson(path))
    val chains = root.get("chains")
    if (chains == null || !chains.isArray)
      Hdf5Format.fail(path, "topology JSON has no 'chains' array")
    val rows = Seq.newBuilder[Row]
    chains.forEach { chain =>
      val cIdx = Option(chain.get("index")).map(_.asInt).getOrElse(0)
      val chainLetter = ('A' + cIdx % 26).toChar.toString
      val residues = chain.get("residues")
      if (residues != null) residues.forEach { res =>
        val rName = Option(res.get("name")).map(_.asText).getOrElse("")
        val rSeq = Option(res.get("resSeq")).map(_.asInt).getOrElse(0)
        val atoms = res.get("atoms")
        if (atoms != null) atoms.forEach { atom =>
          val idx = Option(atom.get("index")).map(_.asInt).getOrElse(
            Hdf5Format.fail(path, "topology atom without an index"))
          val aName = Option(atom.get("name")).map(_.asText).getOrElse("")
          val elem =
            Option(atom.get("element")).map(_.asText).getOrElse("")
          val mass = PdbTopology.elementMasses
            .getOrElse(elem.toUpperCase, 0.0)
          rows += Row(idx, aName, rName, chainLetter, rSeq, elem, mass)
        }
      }
    }
    val out = rows.result()
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), Schema)
  }
}
