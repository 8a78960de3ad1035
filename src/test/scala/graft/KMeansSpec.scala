package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Lloyd fit behavior on planted structure plus q116 invariants —
  * exact values are the DuckDB oracle's job. */
class KMeansSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  test("fit recovers three planted well-separated blobs from seeded starts") {
    import spark.implicits._
    // blob centers far apart; seeds 0/1/2 land one per blob, members
    // 3..59 cycle through blobs with small deterministic jitter
    val centers = Seq(
      Array.fill(8)(0.0), Array.fill(8)(10.0), Array.fill(8)(-10.0))
    val rows = (0 until 60).map { i =>
      val blob = i % 3
      val jitter = 0.01 * ((i * 37 % 13) - 6)
      (i.toLong, centers(blob).map(_ + jitter))
    }
    val e = rows.toDF("vec_id", "v")
    val cents = KMeans.fit(e, k = 3, iters = 3)
    val got = KMeans.assign(e, cents).select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, _) =>
      assert(got(id) == id % 3, s"vec $id landed in ${got(id)}, wanted ${id % 3}")
    }
    // recovered centroids sit on the blob centers (jitter averages ~0)
    val cvs = cents.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    centers.zipWithIndex.foreach { case (c, i) =>
      cvs(i.toLong).zip(c).foreach { case (gotX, wantX) =>
        assert(math.abs(gotX - wantX) < 0.05, s"cluster $i centroid drifted: $gotX vs $wantX")
      }
    }
  }

  test("q116: every vector lands in exactly one of K clusters, distances ordered") {
    val rows = SparkEntry.queries("q116_kmeans_fit")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= KMeans.K)
    val nVec = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_._2).sum == nVec, "every vector assigned exactly once")
    rows.foreach { case (c, n, mn, mx, norm) =>
      assert(n > 0 && mn >= 0.0 && mn <= mx, s"cluster $c: bad distance range")
      assert(norm > 0.0, s"cluster $c: degenerate centroid")
    }
  }
}
