package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed linear algebra over the embeddings table — the
  * "MLlib + distributed linear algebra" leg of the north star. PCA here
  * is the embedding-space diagnostic a curation pipeline runs before
  * semantic dedup or ANN indexing: a spectrum that collapses onto a few
  * components means the space is anisotropic and cosine thresholds
  * calibrated on it drift (the motivation for whitening in
  * SemDeDup-style pruning).
  *
  * Scale shape: `RowMatrix.computePrincipalComponentsAndExplainedVariance`
  * runs one distributed pass to assemble the d×d Gramian (tree-aggregated
  * partials; d = 64 here, so the driver solves a 64×64 eigenproblem —
  * O(d²) driver state, independent of row count), and projection is a
  * per-row matrix-vector product. Nothing corpus-sized leaves the
  * executors. */
object LinAlg {

  /** q103 (rows-only): per-component explained-variance ratios of the
    * embedding covariance, k=8. Eigenvector SIGNS are implementation-
    * specific, so the declared surface reports the sign-free spectrum;
    * the projection API below carries the vectors themselves. */
  def q103PcaVariance(spark: SparkSession, dir: String): DataFrame = {
    val (_, variance) = pca(Tables.embeddings(spark, dir), k = 8)
    import spark.implicits._
    variance.zipWithIndex
      .map { case (v, i) => (i.toLong, math.rint(v * 1e6) / 1e6) }
      .toSeq.toDF("component", "explained_variance_ratio")
      .orderBy("component")
  }

  /** Principal components + explained-variance ratios of an
    * (vec_id, embedding) table. Returns (d×k column-major components,
    * k ratios). */
  def pca(embeddings: DataFrame, k: Int): (Array[Array[Double]], Array[Double]) = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = embeddings
      .select(col("embedding").cast("array<double>").as("v"))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val mat = new RowMatrix(rows)
    val (pc, variance) = {
      val r = mat.computePrincipalComponentsAndExplainedVariance(k)
      (r._1, r._2)
    }
    val d = pc.numRows
    val cols = Array.tabulate(k)(j => Array.tabulate(d)(i => pc(i, j)))
    (cols, variance.toArray.take(k))
  }

  /** Project embeddings onto the top-k principal components — the
    * dimensionality-reduction / whitening front end for downstream
    * similarity work. The k×d projection matrix broadcasts as literals
    * inside the plan; projection is one codegen'd per-row pass. */
  def project(embeddings: DataFrame, components: Array[Array[Double]]): DataFrame = {
    val proj = components.map { comp =>
      val compCol = array(comp.map(lit): _*)
      aggregate(
        zip_with(col("v"), compCol, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id") +: proj.zipWithIndex.map { case (c, i) => c.as(s"pc$i") }: _*)
  }
}
