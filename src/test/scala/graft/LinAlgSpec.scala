package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinAlg

class LinAlgSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("q103 spectrum: ratios are decreasing, nonnegative, and sum to at most 1") {
    val rows = SparkEntry.queries("q103_pca_variance")(spark, TestSpark.sf0001).collect()
    assert(rows.length == 8)
    val ratios = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(ratios.forall(_ >= 0.0))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"explained variance must be non-increasing: ${ratios.mkString(",")}")
    assert(ratios.sum <= 1.0 + 1e-9)
  }

  test("pca finds a planted dominant axis and returns orthonormal components") {
    // variance 100x larger along dimension 3 than anywhere else: the
    // first principal component must align with e3 and claim almost
    // all the variance
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    def noise(i: Int, d: Int) = 0.01 * (((i * 31 + d * 7) % 11) - 5)
    (0 until 200).map { i =>
      val v = Array.tabulate(64)(d => noise(i, d).toFloat)
      v(3) = (if (i % 2 == 0) 1.0f else -1.0f) * (1.0f + 0.001f * i)
      (i.toLong, v)
    }.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val (comps, ratios) = LinAlg.pca(Tables.embeddings(spark, dir), k = 4)
    assert(ratios.head > 0.9, s"dominant axis must claim the spectrum: ${ratios.mkString(",")}")
    assert(math.abs(comps.head(3)) > 0.99, "first component must align with dimension 3")
    // orthonormality
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val expected = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-6, s"components $a,$b dot=$dot")
    }
  }

  test("projection preserves the planted separation at a quarter of the width") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proj").toString
    def noise(i: Int, d: Int) = 0.01 * (((i * 17 + d * 13) % 7) - 3)
    (0 until 100).map { i =>
      val v = Array.tabulate(64)(d => noise(i, d).toFloat)
      v(5) = if (i < 50) 2.0f else -2.0f // two planted clusters
      (i.toLong, v)
    }.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val emb = Tables.embeddings(spark, dir)
    val (comps, _) = LinAlg.pca(emb, k = 16)
    val projected = LinAlg.project(emb, comps).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap // pc0 carries the split
    val a = (0 until 50).map(i => projected(i.toLong))
    val b = (50 until 100).map(i => projected(i.toLong))
    assert(a.forall(x => math.signum(x) == math.signum(a.head)),
      "cluster A must stay on one side of the first component")
    assert(b.forall(x => math.signum(x) == math.signum(b.head)) &&
      math.signum(b.head) != math.signum(a.head),
      "cluster B must land on the other side")
  }
}
