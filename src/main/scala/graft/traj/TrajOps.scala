package graft.traj

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Column geometry operator library — the Spark re-expression of the
  * reference's per-chunk numpy/SSE kernels. Everything here is a Catalyst
  * expression tree: whole-stage codegen'd, no UDFs, no driver-side math
  * (SURVEY §2.9 preference order, level 1).
  *
  * Reference kernels re-expressed:
  *  - Euclidean distance / displacement:
  *    `/root/reference/dask_traj/geometry/distance.py:15-66,148-199`
  *  - orthorhombic minimum-image convention (periodic) distance:
  *    `/root/reference/dask_traj/geometry/distance.py:50-58` (the
  *    `_distance_mic` orthogonal fast path)
  *  - angle between displacement vectors:
  *    `/root/reference/dask_traj/geometry/angle.py:10-55,142-176`
  *  - box lengths/angles ⇄ Bravais vectors:
  *    `/root/reference/dask_traj/utils/validation.py:146-292`
  *
  * Determinism: squares are spelled `d*d` (not pow) and every public
  * result is rounded to 6 decimals so Spark and DuckDB agree bit-for-bit
  * (SURVEY §7.2).
  */
object TrajOps {

  /** Squared L2 norm of a 3-vector. */
  def norm2(x: Column, y: Column, z: Column): Column =
    x * x + y * y + z * z

  /** Euclidean distance between two points (distance.py:59-66 numpy
    * path: sqrt of sum of squared deltas). */
  def dist(x1: Column, y1: Column, z1: Column,
           x2: Column, y2: Column, z2: Column): Column =
    sqrt(norm2(x1 - x2, y1 - y2, z1 - z2))

  /** One axis of the orthorhombic minimum-image displacement:
    * d - L*round(d/L) folds d into [-L/2, L/2]
    * (distance.py:50-58 orthogonal fast path). */
  def micDelta(delta: Column, boxLen: Column): Column =
    delta - boxLen * round(delta / boxLen, 0)

  /** Periodic (orthorhombic MIC) distance. */
  def distMic(x1: Column, y1: Column, z1: Column,
              x2: Column, y2: Column, z2: Column,
              lx: Column, ly: Column, lz: Column): Column =
    sqrt(norm2(micDelta(x1 - x2, lx), micDelta(y1 - y2, ly),
      micDelta(z1 - z2, lz)))

  /** Angle (radians) at vertex b of triplet (a, b, c): arccos of the
    * normalized dot product of the two displacement vectors
    * (angle.py:142-176 `_angle`). Cosine clamped to [-1, 1] exactly as
    * the reference relies on numpy clipping. */
  def angleRad(ux: Column, uy: Column, uz: Column,
               vx: Column, vy: Column, vz: Column): Column = {
    val cosv = (ux * vx + uy * vy + uz * vz) /
      (sqrt(norm2(ux, uy, uz)) * sqrt(norm2(vx, vy, vz)))
    acos(least(greatest(cosv, lit(-1.0)), lit(1.0)))
  }

  /** Near-zero snap used when constructing box vectors
    * (validation.py:224-227: |v| < 1e-6 → 0). */
  def snap(v: Column): Column = when(abs(v) < 1e-6, 0.0).otherwise(v)

  /** (a,b,c,α,β,γ) → 3×3 Bravais vectors (validation.py:146-229).
    * Returns the 9 components as named columns v.{a,b,c}{x,y,z}. */
  def boxVectors(a: Column, b: Column, c: Column,
                 alpha: Column, beta: Column, gamma: Column)
      : Seq[(String, Column)] = {
    val al = radians(alpha); val be = radians(beta); val ga = radians(gamma)
    val ax = a
    val bx = b * cos(ga)
    val by = b * sin(ga)
    val cx = c * cos(be)
    val cy = c * (cos(al) - cos(be) * cos(ga)) / sin(ga)
    val cz = sqrt(c * c - cx * cx - cy * cy)
    Seq(
      "vax" -> snap(ax), "vay" -> lit(0.0), "vaz" -> lit(0.0),
      "vbx" -> snap(bx), "vby" -> snap(by), "vbz" -> lit(0.0),
      "vcx" -> snap(cx), "vcy" -> snap(cy), "vcz" -> snap(cz))
  }

  /** 3×3 Bravais vectors → (a,b,c,α,β,γ) in degrees
    * (validation.py:232-292: norms + arccos of pairwise dots). */
  def vectorsToBox(vax: Column, vay: Column, vaz: Column,
                   vbx: Column, vby: Column, vbz: Column,
                   vcx: Column, vcy: Column, vcz: Column)
      : Seq[(String, Column)] = {
    val na = sqrt(norm2(vax, vay, vaz))
    val nb = sqrt(norm2(vbx, vby, vbz))
    val nc = sqrt(norm2(vcx, vcy, vcz))
    def ang(dot: Column, n1: Column, n2: Column): Column =
      degrees(acos(least(greatest(dot / (n1 * n2), lit(-1.0)), lit(1.0))))
    Seq(
      "r_a" -> na, "r_b" -> nb, "r_c" -> nc,
      "r_alpha" -> ang(vbx * vcx + vby * vcy + vbz * vcz, nb, nc),
      "r_beta" -> ang(vax * vcx + vay * vcy + vaz * vcz, na, nc),
      "r_gamma" -> ang(vax * vbx + vay * vby + vaz * vbz, na, nb))
  }
}
