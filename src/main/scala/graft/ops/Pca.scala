package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over a standardized d=3 trait matrix —
  * the CS5 archetype (reference case-studies/CS5/CS5_viz.py:319-379:
  * StandardScaler + sklearn PCA over the species×trait matrix, then
  * explained-variance ratios, loadings and a score biplot).
  *
  * The 100 TB shape: PCA of a d-column matrix needs ONE single-pass,
  * map-side-combinable covariance aggregate (d(d+1)/2 scalar moments;
  * Spark's `corr` is exactly that machinery) — the N×d data is never
  * shuffled, collected, or iterated. Because the reference standardizes
  * first, the covariance matrix of the scaled data IS the correlation
  * matrix of the raw data (unit diagonal, pairwise correlations off the
  * diagonal; sklearn's n-1 sample scaling multiplies every eigenvalue
  * by n/(n-1) and cancels out of the variance RATIOS), so the whole
  * decomposition reduces to the symmetric-3×3 eigenproblem of the
  * correlation matrix.
  *
  * For d=3 that eigenproblem has a closed trigonometric form (Cardano —
  * the standard symmetric-3×3 direct method), which this module
  * expresses twice from the same formulas:
  *
  *  - [[eigRatioCols]]: as pure `Column` expressions appended to the
  *    one-row aggregate — the eigen-"decomposition" runs inside the
  *    same Spark job as the moments, nothing is collected;
  *  - [[eig3Corr]]: as driver-side doubles (eigenvalues AND
  *    eigenvectors via the cross-product method), for the loadings /
  *    score-projection epilogue, which is dimension-sized (3×3) by
  *    construction.
  */
object Pca {

  /** Closed-form eigenvalue→variance-ratio columns for the symmetric
    * unit-diagonal 3×3 matrix [[1,c12,c13],[c12,1,c23],[c13,c23,1]].
    *
    * With q = tr/3 = 1 the shifted matrix B = (A − qI)/p has zero
    * diagonal, so det(B) = 2·c12·c13·c23/p³ and p = sqrt((c12²+c13²+
    * c23²)/3). Eigenvalues λₖ = 1 + 2p·cos(φ + 2πk/3), φ =
    * acos(clamp(det(B)/2))/3 — already in DESCENDING order for k=0,2,1.
    * Ratios divide by tr = 3. p = 0 (all correlations zero) degenerates
    * to λ = (1,1,1) and is guarded explicitly.
    *
    * The identical formula is reproduced in the DuckDB oracle SQL, so
    * the round-6 gate covers the full eigenvalue path, not just the
    * moments.
    */
  def eigRatioCols(c12: Column, c13: Column, c23: Column): Seq[Column] = {
    val p = sqrt((c12 * c12 + c13 * c13 + c23 * c23) / lit(3.0))
    val r = greatest(lit(-1.0), least(lit(1.0),
      c12 * c13 * c23 / (p * p * p)))
    val phi = acos(r) / lit(3.0)
    val twoPiThird = lit(2.0 * math.Pi / 3.0)
    def lam(shift: Column) =
      when(p === 0.0, lit(1.0)).otherwise(lit(1.0) + lit(2.0) * p * cos(phi + shift))
    val l1 = lam(lit(0.0))
    val l3 = lam(twoPiThird)
    val l2 = lit(3.0) - l1 - l3
    Seq((l1 / 3.0).as("evr1"), (l2 / 3.0).as("evr2"), (l3 / 3.0).as("evr3"))
  }

  /** Driver-side eigendecomposition of the same unit-diagonal symmetric
    * 3×3 correlation matrix: (eigenvalues descending, row-major
    * eigenvectors, unit-norm). Eigenvectors come from the cross-product
    * method — for eigenvalue λ, two rows of (A − λI) span the plane the
    * eigenvector is normal to — with a fallback to the third row pair
    * when the first cross product degenerates. Sign convention: the
    * largest-|component| entry is positive (sklearn's svd_flip
    * analogue), making downstream loadings deterministic.
    */
  def eig3Corr(c12: Double, c13: Double, c23: Double): (Array[Double], Array[Array[Double]]) = {
    val p = math.sqrt((c12 * c12 + c13 * c13 + c23 * c23) / 3.0)
    val eigs =
      if (p == 0.0) Array(1.0, 1.0, 1.0)
      else {
        val r = math.max(-1.0, math.min(1.0, c12 * c13 * c23 / (p * p * p)))
        val phi = math.acos(r) / 3.0
        val l1 = 1.0 + 2.0 * p * math.cos(phi)
        val l3 = 1.0 + 2.0 * p * math.cos(phi + 2.0 * math.Pi / 3.0)
        Array(l1, 3.0 - l1 - l3, l3)
      }
    val a = Array(
      Array(1.0, c12, c13),
      Array(c12, 1.0, c23),
      Array(c13, c23, 1.0))
    def cross(u: Array[Double], v: Array[Double]) = Array(
      u(1) * v(2) - u(2) * v(1),
      u(2) * v(0) - u(0) * v(2),
      u(0) * v(1) - u(1) * v(0))
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val vecs = eigs.map { lam =>
      val m = a.zipWithIndex.map { case (row, i) =>
        row.zipWithIndex.map { case (x, j) => if (i == j) x - lam else x }
      }
      val candidates = Seq(cross(m(0), m(1)), cross(m(0), m(2)), cross(m(1), m(2)))
      val best = candidates.maxBy(norm)
      val n = norm(best)
      require(n > 1e-12,
        s"degenerate eigenvector for lambda=$lam (repeated eigenvalue)")
      val unit = best.map(_ / n)
      val lead = unit.maxBy(math.abs)
      if (lead < 0) unit.map(-_) else unit
    }
    (eigs, vecs)
  }

  /** Reference loadings (CS5_viz.py:361: components.T ·
    * sqrt(explained_variance)): eigenvector columns scaled by the
    * sqrt of their eigenvalue.
    */
  def loadings(eigs: Array[Double], vecs: Array[Array[Double]]): Array[Array[Double]] =
    vecs.zip(eigs).map { case (v, l) => v.map(_ * math.sqrt(math.max(l, 0.0))) }

  /** Project standardized columns onto the leading principal components
    * (the biplot's `pca_scores[:, :2]`, CS5_viz.py:327-335) — a pure
    * map-side epilogue: the 3×k eigenvector matrix rides into the task
    * as literals, no shuffle, no UDF.
    */
  def project(df: DataFrame, cols: Seq[String], vecs: Array[Array[Double]],
      k: Int): DataFrame = {
    require(cols.size == 3, "d=3 projection")
    (0 until k).foldLeft(df) { (d, i) =>
      d.withColumn(s"pc${i + 1}",
        cols.zipWithIndex.map { case (c, j) => col(c) * lit(vecs(i)(j)) }
          .reduce(_ + _))
    }
  }
}
