package graft.traj

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension-dispatch loader — the analog of the reference's top-level
  * `load(filename, chunk_size)` entry point, which routes a path
  * through its per-extension registry to the right reader
  * (core/dask_traj.py:26-56 `file_returns`, :59-84 `load`). Here the
  * registry maps extensions to the DSv2 format names registered in
  * META-INF, so `TrajLoad.load(spark, "traj.dcd")` is exactly
  * `spark.read.format("dcd").load(...)` — lazy, chunk-planned, pushdown
  * -capable — with one uniform front door and a clear error for the
  * extensions the registry knows about but this library does not
  * implement.
  *
  * Directories of shards dispatch on the extension of their first
  * regular file (all shards of one directory must share a format, the
  * same contract the per-format shard planners enforce).
  */
object TrajLoad {

  /** extension (longest-match, lowercase) → DSv2 format short name.
    * Multi-suffix extensions (.xyz.gz) must precede their suffix. */
  val Registry: Seq[(String, String)] = Seq(
    ".xyz.gz" -> "xyz",
    ".xyz" -> "xyz",
    ".xtc" -> "xtc",
    ".nc" -> "netcdf",
    ".ncdf" -> "netcdf",
    ".netcdf" -> "netcdf",
    ".ncrst" -> "netcdf",
    ".gro.gz" -> "gro",
    ".gro" -> "gro",
    ".pdb.gz" -> "pdb",
    ".pdb" -> "pdb",
    ".dcd" -> "dcd",
    ".trr" -> "trr",
    ".lammpstrj.gz" -> "lammpstrj",
    ".lammpstrj" -> "lammpstrj",
    ".mdcrd.gz" -> "mdcrd",
    ".mdcrd" -> "mdcrd",
    ".crd.gz" -> "mdcrd",
    ".crd" -> "mdcrd",
    ".inpcrd.gz" -> "inpcrd",
    ".inpcrd" -> "inpcrd",
    ".rst7.gz" -> "inpcrd",
    ".rst7" -> "inpcrd",
    ".restrt.gz" -> "inpcrd",
    ".restrt" -> "inpcrd",
    ".binpos" -> "binpos",
    ".hdf5" -> "hdf5",
    ".h5" -> "hdf5",
    ".lh5" -> "hdf5",
    ".arc.gz" -> "arc",
    ".arc" -> "arc",
    // Desmond frame-set: a .dtr DIRECTORY, or a .stk text file listing
    // frameset directories (reference registry core/dask_traj.py:46-47)
    ".dtr" -> "dtr",
    ".stk" -> "dtr")

  /** Reference-registry extensions (core/dask_traj.py:26-56) that this
    * library deliberately does not read, with the reason — surfaced in
    * the unknown-extension error so a user porting a workload learns
    * the status in one message.
    *
    * TNG adjudication (round 12, the dtr-style decision): the
    * container grammar itself (64-bit block tree: header block,
    * molecule block, frame-set blocks, each with id/size/MD5/name)
    * is public and parseable, but GROMACS writes coordinate payloads
    * with the bespoke TNG-MF1 compression family (BWLZH — Burrows-
    * Wheeler + stop-bit + Huffman-style stages, Spångberg et al.
    * 2011), so a useful reader means a full clean-room codec. Unlike
    * XTC (validated against the reference's own test.xtc/test.pdb
    * fixture pair) and HDF5 (golden files hand-laid byte-by-byte,
    * possible because the container is uncompressed structure plus
    * standard deflate), this environment has no GROMACS, no reference
    * .tng fixture, and no independent implementation — a TNG codec
    * here could only ever be validated against itself, which is below
    * this repo's fixture evidence bar (self-round-trip is not
    * evidence). Adjudicated fail-fast until an engine-independent
    * oracle exists; the registry row stays, with this rationale in
    * the error a porting user sees.
    *
    * EXIT CRITERION (what evidence flips this decision, so a future
    * session with fixture access can close it in one step): a .tng
    * file WRITTEN BY GROMACS (e.g. `gmx trjconv -o test.tng` over any
    * public trajectory, or the tng library's own tng_example files)
    * TOGETHER WITH an independent dump of its coordinates (the same
    * trajectory in a second format this library already reads — .xtc,
    * .trr, .h5 — or a published text dump such as `gmx dump`
    * output). With that pair committed under fixtures/, the reader is
    * validated the same way XTC was (decode the TNG, hash-compare
    * against the independently-read coordinates at the format's
    * stated precision), and the BWLZH codec work becomes justified.
    * A fixture produced by this repo's own writer does NOT qualify. */
  val KnownUnsupported: Map[String, String] = Map(
    ".tng" -> ("GROMACS TNG container — block tree whose coordinate " +
      "payloads use the bespoke TNG-MF1 (BWLZH) compression; with no " +
      "reference fixture or independent oracle available, a " +
      "clean-room codec could only validate against itself, so this " +
      "row is adjudicated fail-fast rather than shipped unverified. " +
      "To flip: provide a GROMACS-written .tng plus an independent " +
      "coordinate dump of the same trajectory (.xtc/.trr/.h5 or gmx " +
      "dump output) as a fixture pair"))

  private def extensionOf(name: String): Option[(String, String)] = {
    val lower = name.toLowerCase
    Registry.find { case (ext, _) => lower.endsWith(ext) }
  }

  /** Resolves the format for a path: a file dispatches on its own name;
    * a directory dispatches on ITS name when that name carries a
    * registry extension (a `foo.dtr` frameset is one trajectory), else
    * on the name of its first regular file (a shard directory). */
  def formatFor(path: String): String = {
    import graft.sources.FsIO
    val fname = FsIO.fileName(path)
    val probe =
      if (FsIO.isDirectory(path) && extensionOf(fname).isDefined) fname
      else if (FsIO.isDirectory(path))
        FsIO.list(path).filter(_.isFile).headOption
          .map(_.name).getOrElse(
            throw new IllegalArgumentException(
              s"trajectory load: directory $path contains no files"))
      else fname
    extensionOf(probe).map(_._2).getOrElse {
      val lower = probe.toLowerCase
      val known = KnownUnsupported.collectFirst {
        case (ext, why) if lower.endsWith(ext) =>
          s"'$ext' is in the reference registry but unsupported here: $why"
      }
      throw new IllegalArgumentException(
        s"trajectory load: no reader for '$probe'. " +
          known.getOrElse("Supported extensions: " +
            Registry.map(_._1).mkString(", ")))
    }
  }

  /** One-call load: dispatch on extension, pass options through to the
    * format (chunks, unit_scale, mode — the per-format docs list them).
    * `chunkSize` mirrors the reference's `load(..., chunk_size)`
    * parameter and maps to the sources' `chunks` (frames per
    * partition). */
  def load(spark: SparkSession, path: String,
      chunkSize: Option[Int] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format(formatFor(path)).options(options)
    chunkSize.fold(reader)(c => reader.option("chunks", c)).load(path)
  }

  /** Multi-file load — the reference inherits mdtraj's list-of-files
    * `load` (core/dask_traj.py:61; mdtraj's first argument may be a
    * LIST), the idiom a porting user reaches for first. Every path
    * (file, directory, or trailing-segment glob) must dispatch to ONE
    * format; frame ids are globally contiguous across paths in
    * argument order (see [[graft.sources.MultiPath]]). */
  def load(spark: SparkSession, paths: Seq[String],
      chunkSize: Option[Int], options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw new IllegalArgumentException(
      "trajectory load: empty path list")
    val fmts = paths.map(formatFor).distinct
    if (fmts.size != 1) throw new IllegalArgumentException(
      s"trajectory load: paths span multiple formats " +
        s"(${fmts.mkString(", ")}) — one load takes one format")
    val reader = spark.read.format(fmts.head).options(options)
    chunkSize.fold(reader)(c => reader.option("chunks", c))
      .load(paths: _*)
  }

  def load(spark: SparkSession, paths: Seq[String]): DataFrame =
    load(spark, paths, None, Map.empty)

  /** The other half of the reference's `load(filename, top=...)`
    * semantics (core/dask_traj.py:61,80-83): beyond the atom COUNT the
    * sources already consume from the `top` option, the topology
    * delivers per-atom identity and MASSES — what
    * `compute_center_of_mass` reads off `traj.top`
    * (geometry/distance.py:319-320). Returns the atom dimension
    * `(atom_id, name, res_name, chain, res_seq, element, mass)` with
    * `atom_id` the 0-based file-order ordinal every trajectory source
    * emits, so it broadcast-joins onto any loaded trajectory —
    * masses are IUPAC 2021 weights keyed on the PDB element column
    * ([[graft.sources.PdbTopology.elementMasses]]). Pass the SAME path
    * given as the `top=` read option:
    * {{{
    * val traj = TrajLoad.load(spark, "run42.mdcrd",
    *   options = Map("top" -> "protein.pdb"))
    * val com  = TrajQueries.comOfLoaded(traj,
    *   TrajLoad.topology(spark, "protein.pdb"))
    * }}} */
  def topology(spark: SparkSession, path: String): DataFrame = {
    import graft.sources.FsIO
    val lower = FsIO.fileName(path).toLowerCase
    if (lower.endsWith(".pdb") || lower.endsWith(".pdb.gz"))
      graft.sources.PdbTopology.topology(spark, path)
    else if (lower.endsWith(".h5") || lower.endsWith(".hdf5"))
      // mdtraj .h5 is SELF-describing: the topology rides inside the
      // trajectory as the convention's embedded JSON dataset (r12)
      graft.sources.Hdf5Topology.topology(spark, path)
    else throw new IllegalArgumentException(
      s"trajectory topology: no parser for '$path' — topologies are " +
        "PDB files (.pdb/.pdb.gz) or mdtraj .h5 trajectories with the " +
        "convention's embedded topology dataset")
  }
}
