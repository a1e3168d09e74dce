package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with ±1 signs (Achlioptas
  * 2003): y_j = Σ_i s(j,i)·q_i over the round(x·1000) integer
  * quantization, giving a k-dim integer sketch that preserves pairwise
  * distances within (1±ε) for k = O(log n / ε²) — the standard
  * dimensionality-reduction front end for embedding pipelines (cheaper
  * ANN scans, dedup pre-filters, OOD detection).
  *
  * Engine-portable by construction: the sign matrix derives from the
  * public formula s(j,i) = +1 iff sha256("rp#j#i")'s 48-bit prefix is
  * even, and the projection itself is exact i64 arithmetic — so any
  * engine with sha256 reproduces every output value bit for bit (the
  * DuckDB oracle replays signs, quantization and sums exactly).
  *
  * Scale shape: the signs are a k×dim driver-side literal folded into
  * the codegen'd plan (no join, no shuffle — the projection is a narrow
  * map over the corpus); k·dim multiply-adds per row, nothing else.
  */
object RandomProjection {

  private def sha48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
  }

  /** +1 / −1 from the public hash formula — the driver-side twin of the
    * oracle's sha256 CASE. */
  def sign(j: Int, i: Int): Long =
    if (sha48(s"rp#$j#$i") % 2 == 0) 1L else -1L

  /** Project `vecCol` (array<float>, length `dim`) to `k` integer
    * components. Output: (idCol, j, y) — one row per component, exact
    * i64. Inputs shorter than `dim` fail loudly (ANSI null from the
    * out-of-range access would silently zero the tail otherwise).
    */
  def project(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int): DataFrame = {
    require(dim >= 1 && k >= 1, s"dim and k must be >= 1, got ($dim, $k)")
    val qv = when(size(col(vecCol)) =!= dim,
      raise_error(concat(lit(s"RandomProjection: expected $dim dims, got "),
        size(col(vecCol)).cast("string"))))
      .otherwise(expr(
        s"transform(`$vecCol`, x -> cast(round(cast(x as double) * 1000) as bigint))"))
    val signRows = (0 until k).map(j =>
      array((0 until dim).map(i => lit(sign(j, i))): _*))
    val comps = array(signRows.map(s =>
      aggregate(zip_with(col("_qv"), s, (a, b) => a * b), lit(0L), _ + _)): _*)
    df.select(col(idCol), qv.as("_qv"))
      .select(col(idCol), posexplode(comps).as(Seq("j", "y")))
  }
}
