package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) over fixed-point
  * vectors — the memory-compressed ANN scan path: a 64-dim float vector
  * (256 B) becomes `m` small codes (8 B at m=8), so a 100-TB embedding
  * corpus scans from ~3 TB of codes, and the asymmetric-distance (ADC)
  * scan replaces per-dimension arithmetic with `m` table lookups per row.
  *
  * Division of labor with the rest of `graft.ann`: [[KMeans.fitAssign]]
  * is the codebook TRAINER (run it per subspace over sliced subvectors —
  * PQ codebooks are literally m independent k-means); [[Pq]] takes the
  * trained (or planted, for oracle-exact tests) codebooks and does the
  * scale-critical parts: encode and compressed-domain scan. Everything is
  * exact integer arithmetic on [[KMeans.fixedPoint]] vectors — argmin of
  * integer squared distances, ties to the smallest code — so a SQL oracle
  * restates encode and ADC verbatim (the q89/q100 planted-centroid
  * discipline).
  *
  * Scale shape: codebooks are driver-small (m·k·subDim longs) and
  * broadcast; encode is one primitive-loop projection (m·k·subDim
  * mul-adds per row, no shuffle); the ADC scan broadcasts an m·k
  * distance TABLE (built on the driver from the query alone) and sums m
  * lookups per row — no join, no shuffle, the scan stays inside the
  * parquet read's partitioning.
  */
object Pq {

  /** codebooks(s)(c) = the subDim-long centroid for code c of subspace s;
    * all subspaces must have the same code count and sub-dimension. */
  type Codebooks = Array[Array[Array[Long]]]

  /** Slice full fixed-point vectors into per-subspace codebooks — the
    * planted-codebook constructor (oracle tests: "codes 0..k-1 are the
    * subvectors of the k smallest-id vectors"), and the adapter from any
    * trainer that yields full-width centroids. */
  def sliceCodebooks(vectors: Array[Array[Long]], m: Int): Codebooks = {
    require(vectors.nonEmpty, "need at least one codebook vector")
    val d = vectors(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sd = d / m
    Array.tabulate(m)(s => vectors.map(_.slice(s * sd, (s + 1) * sd)))
  }

  /** Train codebooks: m independent integer k-means runs ([[KMeans.fit]])
    * over the sliced subvectors — the textbook PQ trainer. Each subspace
    * run scans `df` iters times over a subDim-wide projection (train on a
    * SAMPLE at 100 TB — PQ codebooks converge on a tiny fraction of the
    * corpus; encode is the full-scan pass, not training). */
  def trainCodebooks(df: DataFrame, vec: Column, id: Column, m: Int, k: Int,
      iters: Int): Codebooks = {
    val first = df.select(vec.as("v")).limit(1).collect()
    require(first.nonEmpty, "cannot train codebooks on an empty frame")
    val d = first(0).getSeq[Long](0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sd = d / m
    Array.tabulate(m) { s =>
      val off = s * sd
      KMeans.fit(df, slice(vec, off + 1, sd), id, k, iters)
    }
  }

  private def nearestCode(cb: Array[Array[Long]], v: Seq[Long], off: Int): (Int, Long) = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < cb.length) {
      val cv = cb(c); var dd = 0L; var j = 0
      while (j < cv.length) { val t = v(off + j) - cv(j); dd += t * t; j += 1 }
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Encode vectors to PQ codes: per subspace, the argmin-distance code
    * (ties to the smallest index). Input `vec` must be array<long>
    * ([[KMeans.fixedPoint]]) of length m·subDim. Output (id, codes)
    * with codes array<long> of length m. Null vectors emit null codes. */
  def encode(df: DataFrame, vec: Column, id: Column, codebooks: Codebooks): DataFrame = {
    val cb = codebooks
    val m = cb.length
    val d = m * cb(0)(0).length
    val sd = cb(0)(0).length
    val u = udf { (v: Seq[Long]) =>
      if (v == null) null
      else {
        require(v.length == d, s"vector dim ${v.length} != codebook dim $d")
        val out = new Array[Long](m)
        var s = 0
        while (s < m) { out(s) = nearestCode(cb(s), v, s * sd)._1.toLong; s += 1 }
        out
      }
    }
    df.select(id.cast("long").as("id"), u(vec).as("codes"))
  }

  /** Base-k positional checksum of a code array: Σ codes(s)·k^s — a
    * single long that pins the exact code assignment (driver-compare
    * friendly: array columns hash awkwardly through pandas). Requires
    * k^m ≤ Long.MaxValue. */
  def codeKey(codes: Column, k: Int): Column = {
    val kk = k.toLong
    val u = udf { (cs: Seq[Long]) =>
      if (cs == null) null.asInstanceOf[java.lang.Long]
      else {
        var acc = 0L; var p = 1L; var s = 0
        while (s < cs.length) { acc += cs(s) * p; p *= kk; s += 1 }
        java.lang.Long.valueOf(acc)
      }
    }
    u(codes)
  }

  /** Asymmetric distance: approximate squared distance from one query
    * (fixed-point, full width) to an encoded vector =
    * Σ_s table(s)(codes(s)) where table(s)(c) = ‖query_s − codebook(s)(c)‖².
    * The table is built on the DRIVER (m·k integer distances) and ships
    * in the closure; the scan is m array lookups + adds per row — no
    * join, no shuffle, composable into any projection over the codes. */
  def adcDist(codes: Column, query: Array[Long], codebooks: Codebooks): Column = {
    val m = codebooks.length
    val sd = codebooks(0)(0).length
    require(query.length == m * sd, s"query dim ${query.length} != ${m * sd}")
    val tb: Array[Array[Long]] = Array.tabulate(m) { s =>
      codebooks(s).map { cv =>
        var dd = 0L; var j = 0
        while (j < sd) { val t = query(s * sd + j) - cv(j); dd += t * t; j += 1 }
        dd
      }
    }
    val u = udf { (cs: Seq[Long]) =>
      if (cs == null) null.asInstanceOf[java.lang.Long]
      else {
        var acc = 0L; var s = 0
        while (s < cs.length) { acc += tb(s)(cs(s).toInt); s += 1 }
        java.lang.Long.valueOf(acc)
      }
    }
    u(codes)
  }
}
