package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Pca

/** Distributed PCA: eigensolver correctness, basis orthonormality,
  * projected-covariance diagonalization, whitening, partitioning
  * invariance, and recovery of a planted low-rank structure. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("symEigen: reconstructs a known symmetric matrix, descending " +
      "eigenvalues, orthonormal basis") {
    // A = diag(5, 2, 1) rotated by a fixed orthogonal matrix
    val c = math.cos(0.7)
    val s = math.sin(0.7)
    val rot = Array(
      Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val diag = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => rot(i)(k) * diag(k) * rot(j)(k)).sum
    }
    val (evals, evecs) = Pca.symEigen(a)
    assert(evals.zip(Array(5.0, 2.0, 1.0)).forall { case (x, y) => close(x, y) })
    // orthonormal rows
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => evecs(i)(k) * evecs(j)(k)).sum
      assert(close(dot, if (i == j) 1.0 else 0.0, 1e-9))
    }
    // A v = λ v for each pair
    for (j <- 0 until 3; i <- 0 until 3) {
      val av = (0 until 3).map(k => a(i)(k) * evecs(j)(k)).sum
      assert(close(av, evals(j) * evecs(j)(i), 1e-8))
    }
  }

  test("fit recovers a planted dominant axis; projection diagonalizes " +
      "covariance; whitening gives unit variance") {
    // deterministic data: dominant variation along u1=(1,1,0,0)/√2,
    // secondary along u3=(0,0,1,-1)/√2, tiny noise elsewhere
    val n = 400
    val rows = (0 until n).map { i =>
      val t = math.sin(i * 2.4) * 10.0       // big amplitude on u1
      val u = math.cos(i * 1.3) * 2.0        // small amplitude on u3
      val e = math.sin(i * 7.77) * 0.01
      Array((t / math.sqrt(2) + e).toFloat, (t / math.sqrt(2) - e).toFloat,
        (u / math.sqrt(2)).toFloat, (-u / math.sqrt(2)).toFloat)
    }
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val model = Pca.fit(df, "vec", r = 2)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    // first component ≈ ±(1,1,0,0)/√2
    val c0 = model.components(0)
    assert(close(math.abs(c0(0)), 1.0 / math.sqrt(2), 1e-2))
    assert(close(math.abs(c0(1)), 1.0 / math.sqrt(2), 1e-2))
    assert(math.abs(c0(2)) < 0.05 && math.abs(c0(3)) < 0.05)

    val proj = Pca.project(df, "vec", model).select("pca")
      .as[Seq[Double]].collect()
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val v0 = variance(proj.map(_(0)).toSeq)
    val v1 = variance(proj.map(_(1)).toSeq)
    assert(close(v0, model.eigenvalues(0), 1e-6))
    assert(close(v1, model.eigenvalues(1), 1e-6))
    // cross-covariance ~ 0
    val m0 = proj.map(_(0)).sum / n
    val m1 = proj.map(_(1)).sum / n
    val cross = proj.map(p => (p(0) - m0) * (p(1) - m1)).sum / (n - 1)
    assert(math.abs(cross) < 1e-6 * model.eigenvalues(0))

    val white = Pca.project(df, "vec", model, whiten = true).select("pca")
      .as[Seq[Double]].collect()
    assert(close(variance(white.map(_(0)).toSeq), 1.0, 1e-6))
    assert(close(variance(white.map(_(1)).toSeq), 1.0, 1e-6))
  }

  test("fit is invariant to partitioning (up to float tolerance) and " +
      "skips NULL vectors; projection leaves input columns untouched") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m1 = Pca.fit(emb.repartition(1), "embedding", r = 4)
    val m32 = Pca.fit(emb.repartition(32), "embedding", r = 4)
    m1.eigenvalues.zip(m32.eigenvalues).foreach { case (a, b) =>
      assert(close(a, b, 1e-7), s"eigenvalues diverge: $a vs $b") }
    m1.components.zip(m32.components).foreach { case (u, v) =>
      val dot = u.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) > 1.0 - 1e-6, s"component basis diverges: $dot")
    }
    val withNull = emb.withColumn("embedding",
      when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("embedding")))
    val mN = Pca.fit(withNull, "embedding", r = 2)
    assert(mN.dim == 64)
    val out = Pca.project(emb, "embedding", m1, outCol = "p")
    assert(out.columns.toSeq ==
      emb.columns.toSeq :+ "p")
    assert(out.select(size(col("p"))).distinct().as[Int].collect()
      .toSeq == Seq(4))
  }

  test("moments table: batch fit == direct fit; strata rows pool; " +
      "replayed batch_id rows dedupe instead of double-counting") {
    import graft.analytics.Pca
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val direct = Pca.fit(emb, "embedding", r = 4)
    val global = Pca.momentsTable(emb, "embedding")
    val fromTable = Pca.fitFromMoments(global, r = 4)
    direct.eigenvalues.zip(fromTable.eigenvalues).foreach { case (a, b) =>
      assert(close(a, b, 1e-9), s"eigenvalue drift: $a vs $b") }
    // per-stratum rows pool to the same model
    val byLabel = Pca.momentsTable(emb, "embedding", Seq("label"))
    assert(byLabel.count() > 1)
    val pooled = Pca.fitFromMoments(byLabel.drop("label"), r = 4)
    direct.eigenvalues.zip(pooled.eigenvalues).foreach { case (a, b) =>
      assert(close(a, b, 1e-7), s"pooled eigenvalue drift: $a vs $b") }
    // replay: duplicating a (strata, batch_id) row must not change the fit
    val withBatch = byLabel.withColumn("batch_id", lit(0L))
    val replayed = withBatch.unionByName(withBatch)
    val rep = Pca.fitFromMoments(replayed, r = 4)
    pooled.eigenvalues.zip(rep.eigenvalues).foreach { case (a, b) =>
      assert(close(a, b, 1e-12), s"replayed row double-counted: $a vs $b") }
  }

  test("momentsSink: per-batch moment rows append; fit across batches " +
      "== fit over all rows seen") {
    import graft.analytics.Pca
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("pcamoments")
    val path = s"$base/table"
    val ckpt = s"$base/ckpt"
    val all = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = Pca.momentsSink(mem.toDF.toDF("vec_id", "embedding"),
      "embedding", Nil, path, ckpt).start()
    mem.addData(all.take(30).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(all.drop(30).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val table = spark.read.parquet(path)
    assert(table.select("batch_id").distinct().count() == 2)
    val streamed = Pca.fitFromMoments(table, r = 3)
    val direct = Pca.fit(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "embedding", r = 3)
    direct.eigenvalues.zip(streamed.eigenvalues).foreach { case (a, b) =>
      assert(close(a, b, 1e-9), s"streamed fit drift: $a vs $b") }
  }

  test("explained variance: top-r eigenvalue share grows with r and " +
      "total variance equals the trace") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = Pca.fit(emb, "embedding", r = 64)
    assert(full.eigenvalues.toSeq == full.eigenvalues.sorted.reverse.toSeq)
    // trace check: Σλ == Σ per-coordinate variance (same pass, via fit's
    // own covariance — recompute coordinate variances in SQL)
    val varsSql = (0 until 64).map(i =>
      var_samp(element_at(col("embedding"), i + 1).cast("double")))
    val trace = emb.select(varsSql.reduce(_ + _)).as[Double].head()
    assert(close(full.eigenvalues.sum, trace, 1e-6))
  }
}
