package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants and the ADC recall calibration —
  * the check that decides whether a corpus can be served from PqM-byte
  * codes at all. Exact code/ADC values are the DuckDB oracle's job. */
class PqSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  test("q114 codes: one code per (vector, subspace), codebook self-assignment is exact") {
    val rows = SparkEntry.queries("q114_pq_codes")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val nVec = Tables.embeddings(spark, sf0001).count()
    assert(rows.length == nVec * operators.Quantize.PqM)
    assert(rows.forall { case (_, sub, code, dist) =>
      sub >= 0 && sub < operators.Quantize.PqM &&
        code >= 0 && code < operators.Quantize.PqK && dist >= 0.0
    })
    // a seed vector's own slice is in the codebook: distance must be 0
    // (tie-break may pick an identical-slice lower code, but never a
    // farther one)
    rows.filter(_._1 < operators.Quantize.PqK).foreach { case (id, sub, _, dist) =>
      assert(dist == 0.0, s"seed $id sub $sub: nonzero self distance $dist")
    }
  }

  /** Exact squared-L2 top-10 per query, computed in-memory from the raw
    * embeddings — the truth both retrieval paths are recalled against. */
  private lazy val exactTop10: Map[Long, Set[Long]] = {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.keys.filter(_ < 10).map { q =>
      val qv = vecs(q)
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
  }

  /** Mean recall@10, with per-query rank-contiguity and score-monotone
    * checks (scoreCol is the column the ranking claims to order by). */
  private def meanRecall(rows: Array[(Long, Long, Long, Double)],
                         what: String): Double = {
    val recalls = rows.groupBy(_._1).map { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).sameElements(1L to byRank.size), s"$what q$q: rank gap")
      assert(byRank.map(_._4).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      }, s"$what q$q: score not monotone in rank")
      byRank.map(_._3).count(exactTop10(q).contains) / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"$what recall@10 vs exact L2: mean $mean%.2f over ${recalls.size} queries")
    mean
  }

  test("q114b pure ADC: ranked per query, monotone; recall floor on the uniform worst case") {
    val adc = SparkEntry.queries("q114b_pq_adc_topk")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(adc.nonEmpty)
    // uniform synthetic embeddings are the PQ worst case (no cluster
    // structure for 4-bit codes to exploit) — the pure-ADC floor is low
    // by nature; the production path is q115
    assert(meanRecall(adc, "pure ADC") >= 0.12)
  }

  test("q115 two-stage: exact re-rank of the ADC shortlist lifts recall") {
    val rr = SparkEntry.queries("q115_pq_rerank")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rr.nonEmpty)
    val adc = SparkEntry.queries("q114b_pq_adc_topk")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val twoStage = meanRecall(rr, "shortlist-50 + exact re-rank")
    assert(twoStage >= 0.45, f"two-stage recall collapsed: $twoStage%.2f")
    assert(twoStage >= meanRecall(adc, "pure ADC"),
      "re-ranking the shortlist must not lose recall vs pure ADC")
  }
}
