package graft.pipeline

/** Deterministic pseudo-random hyperplanes for sign-LSH.
  *
  * Weights are derived from md5 so that BOTH engines of the correctness gate
  * can reproduce them: the matrix is generated once at plan-build time and
  * inlined as literal arrays into the Spark plan and the DuckDB oracle SQL —
  * no cross-engine hash arithmetic, bit-identical by construction.
  *
  * w(p, i) = uint32(first 4 bytes of md5("seed:p:i")) / 2^32 − 0.5, i.e.
  * i.i.d.-looking weights in [-0.5, 0.5) over ALL vector components — unlike
  * axis-aligned planes over the first dims, which inherit any correlation in
  * the leading components and produce hot buckets.
  */
object Planes {

  def hyperplanes(nPlanes: Int, dims: Int, seed: String): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dims) { (p, i) =>
      val h = md.digest(s"$seed:$p:$i".getBytes("UTF-8"))
      val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      u.toDouble / 4294967296.0 - 0.5
    }
  }

  /** DuckDB literal for one plane. Each element routes through a
    * VARCHAR→DOUBLE parse: Double.toString round-trips exactly under string
    * parsing, whereas a bare decimal literal would take DuckDB's
    * DECIMAL→DOUBLE cast, which can be one ulp off for 17-digit values.
    */
  def sqlArray(w: Array[Double]): String =
    w.map(x => s"'$x'::DOUBLE").mkString("[", ", ", "]")
}
