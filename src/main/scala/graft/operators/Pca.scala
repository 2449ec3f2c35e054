package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the linear-projection stage
  * of an embedding pipeline (dimensionality reduction before ANN indexing,
  * whitening before cosine dedup, OPQ-style rotations). The distributed
  * work is exactly two corpus passes (mean, then centered Gram via the
  * one-pass `gram_agg` aggregate, each a single partial-agg shuffle whose
  * reduce side is O(d²) CONSTANTS, not data); the d×d eigendecomposition
  * runs on the driver — O(d³) work on a 64×64 matrix is microseconds and
  * data-independent, the same legitimate driver-side math as a k-means
  * seed or a PQ codebook — and the resulting basis is broadcast back as
  * literal arrays inside a narrow projection expression.
  *
  * The fitted model is a plain case class (mean, eigenvalues, row-major
  * basis) — persistable, auditable, and applicable to a STREAM (the
  * projection is stateless per-row arithmetic, so ingest-time projection
  * needs no state store).
  */
object Pca {

  /** Upper-triangle Gram matrix of `emb` as (i, j, gram) rows, i ≤ j —
    * the exploded form of one `gram_agg` pass (the d(d+1)/2-element
    * triangle never exceeds one array row until this final explode).
    * On integer-valued vectors (e.g. [[Similarity.quantizeInt8]] output
    * cast to double) the sums are exact while they stay within 2^53, so
    * the result is order-independent — q_embed_gram pins that exactly.
    */
  def gramMatrix(df: DataFrame, emb: Column, dim: Int): DataFrame = {
    val tri = (0 until dim).flatMap(i => (i until dim).map(j => (i, j)))
    val is = typedlit(tri.map(_._1).toArray)
    val js = typedlit(tri.map(_._2).toArray)
    df.agg(call_function("gram_agg", emb.cast("array<double>"), lit(dim)).as("_g"))
      .select(posexplode(col("_g")).as(Seq("_p", "gram")))
      .select(
        element_at(is, col("_p") + 1).as("i"),
        element_at(js, col("_p") + 1).as("j"),
        col("gram"))
  }

  /** Fitted PCA model. `basis` holds the top-k eigenvectors of the
    * covariance as rows (unit-norm, eigenvalue-descending); `eigenvalues`
    * are the matching per-component variances.
    */
  final case class Model(
      mean: Array[Double],
      eigenvalues: Array[Double],
      basis: Array[Array[Double]]) {
    def k: Int = basis.length
    def dim: Int = mean.length
  }

  /** Fit PCA on `emb` (`array<float|double>` of length `dim`): per-position
    * mean [one partial-agg shuffle], centered covariance via `gram_agg`
    * [one more], Jacobi eigendecomposition of the d×d result on the
    * driver, top-`k` eigenpairs by descending eigenvalue.
    */
  def fit(df: DataFrame, emb: Column, dim: Int, k: Int): Model = {
    require(k > 0 && k <= dim, s"need 0 < k <= dim, got k=$k dim=$dim")
    val e = emb.cast("array<double>")
    // NULL-vector rows must be out of BOTH passes: gram_agg skips them,
    // and a count(*) that didn't would silently shrink the covariance
    val rows = df.filter(e.isNotNull)
    val meanRow = rows
      .select(posexplode(e).as(Seq("_p", "_x")))
      .groupBy("_p").agg(avg("_x").as("_m"))
      .orderBy("_p")
      .select("_m").collect().map(_.getDouble(0))
    require(meanRow.length == dim,
      s"expected $dim positions, saw ${meanRow.length} — is dim right?")
    val meanLit = typedlit(meanRow)
    val centered = transform(e, (x, i) => x - element_at(meanLit, i + 1))
    val row = rows.agg(
        call_function("gram_agg", centered, lit(dim)).as("_g"),
        count(lit(1)).as("_n"))
      .collect().head
    val tri = row.getSeq[Double](0).toArray
    val n = row.getLong(1)
    require(n > 1, s"need at least 2 rows to fit a covariance, got $n")
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = tri(p) / (n - 1)
        cov(i)(j) = v
        cov(j)(i) = v
        p += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(ix => -vals(ix)).take(k)
    Model(meanRow,
      order.map(vals).toArray,
      order.map(ix => vecs.map(_(ix))).toArray)
  }

  /** Project `emb` onto the model's basis: adds `out` = k-element
    * `array<double>` of principal components. Pure narrow arithmetic
    * (basis and mean ride along as literals) — stream-safe.
    */
  def project(df: DataFrame, emb: Column, model: Model,
      out: String = "pca"): DataFrame =
    withComponents(df, emb, model, out, whitened = false)

  /** [[project]] scaled per-component by 1/√eigenvalue, so the output has
    * identity covariance on the fitted corpus — the whitening that evens
    * out dominant directions before cosine near-dup or OPQ.
    */
  def whiten(df: DataFrame, emb: Column, model: Model,
      out: String = "pca_white"): DataFrame =
    withComponents(df, emb, model, out, whitened = true)

  private def withComponents(df: DataFrame, emb: Column, model: Model,
      out: String, whitened: Boolean): DataFrame = {
    require(!df.columns.contains(out),
      s"input already has a '$out' column — the projection would shadow it")
    val meanLit = typedlit(model.mean)
    val centered = transform(emb.cast("array<double>"),
      (x, i) => x - element_at(meanLit, i + 1))
    val comps = model.basis.zip(model.eigenvalues).map { case (b, ev) =>
      val dot = aggregate(
        zip_with(centered, typedlit(b), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      if (whitened) dot / math.sqrt(ev) else dot
    }
    df.withColumn(out, array(comps.toIndexedSeq: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5): rotate away the largest off-diagonal until convergence.
    * Returns (eigenvalues, eigenvector matrix V with eigenvectors as
    * COLUMNS). Driver-side by design — O(d³) on a d×d constant matrix.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2x2 symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
