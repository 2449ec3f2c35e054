package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gramMatrix equals the hand-computed outer-product sum") {
    // vectors (1,2,3) and (4,5,6): gram = [[17,22,27],[22,29,36],[27,36,45]]
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)).toDF("v")
    val g = Pca.gramMatrix(df, col("v"), dim = 3)
      .as[(Int, Int, Double)].collect().map { case (i, j, x) => (i, j) -> x }.toMap
    assert(g === Map(
      (0, 0) -> 17.0, (0, 1) -> 22.0, (0, 2) -> 27.0,
      (1, 1) -> 29.0, (1, 2) -> 36.0, (2, 2) -> 45.0))
    // result is independent of partitioning (merge path exercised)
    val g7 = Pca.gramMatrix(df.repartition(7), col("v"), dim = 3)
      .as[(Int, Int, Double)].collect().map { case (i, j, x) => (i, j) -> x }.toMap
    assert(g7 === g)
    // a wrong-length vector fails loudly instead of corrupting the sum
    val bad = Seq(Seq(1.0, 2.0)).toDF("v")
    intercept[Exception] { Pca.gramMatrix(bad, col("v"), dim = 3).collect() }
    // so does a NULL element (silent garbage on some ArrayData impls)
    val withNull = Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
    intercept[Exception] {
      Pca.gramMatrix(withNull.select(col("v").cast("array<double>").as("v")),
        col("v"), dim = 3).collect()
    }
  }

  test("jacobiEigen recovers a known symmetric spectrum") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/√2) and 1 (along (1,-1)/√2)
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-10)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-10)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1.0 / math.sqrt(2)) < 1e-10)
    assert(math.abs(v0(0) - v0(1)) < 1e-10, "top eigenvector is (1,1)-aligned")
  }

  test("fit/project/whiten: planted 2D subspace in 6 dims") {
    // x = a·u + b·v + mean, a ~ ±{1..8} large, b smaller, no noise outside
    // the plane — the top-2 eigenpairs must capture ALL the variance.
    val u = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val v = Array(0.0, 1.0, -1.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val rows = (0 until 64).map { i =>
      val a = ((i % 16) - 7.5) * 2.0
      val b = ((i / 16) - 1.5) * 1.0
      (0 until 6).map(p => 10.0 + a * u(p) + b * v(p))
    }
    val df = rows.map(r => Tuple1(r)).toDF("emb")
    val model = Pca.fit(df, col("emb"), dim = 6, k = 3)
    // eigenvalues descend; the third is ~0 (no variance off the plane)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) > 1.0)
    assert(math.abs(model.eigenvalues(2)) < 1e-9)
    // basis rows are unit-norm and orthogonal
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
    model.basis.foreach(b => assert(math.abs(dot(b, b) - 1.0) < 1e-9))
    assert(math.abs(dot(model.basis(0), model.basis(1))) < 1e-9)
    // top-2 basis spans {u, v}: projecting u and v onto the basis preserves
    // their norm
    Seq(u, v).foreach { w =>
      val c = model.basis.take(2).map(b => dot(b, w))
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9,
        "planted direction must lie in the top-2 eigenspace")
    }
    // projected components: mean ~0, per-component variance = eigenvalue
    val proj = Pca.project(df, col("emb"), model).select("pca")
      .as[Seq[Double]].collect()
    (0 until 2).foreach { c =>
      val xs = proj.map(_(c))
      val m = xs.sum / xs.length
      val varc = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(m) < 1e-9)
      assert(math.abs(varc - model.eigenvalues(c)) < 1e-6 * model.eigenvalues(c))
    }
    // whitened: unit variance per component
    val white = Pca.whiten(df, col("emb"), model).select("pca_white")
      .as[Seq[Double]].collect()
    (0 until 2).foreach { c =>
      val xs = white.map(_(c))
      val m = xs.sum / xs.length
      val varc = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(varc - 1.0) < 1e-6)
    }
    // projection is a narrow stream-safe expression: works on a stream
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Seq[Double]](spark)
    val sdf = Pca.project(mem.toDF().toDF("emb"), col("emb"), model)
    assert(sdf.isStreaming)
    // NULL-vector rows sit outside both fit passes: same model either way
    val withNulls = df.union(Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("emb"))
    val model2 = Pca.fit(withNulls, col("emb"), dim = 6, k = 3)
    assert(model2.eigenvalues(0) === model.eigenvalues(0))
    assert(model2.mean.toSeq === model.mean.toSeq)
  }
}
