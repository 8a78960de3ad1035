package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE trainer + encoder behavior: hand-computed fixtures, the
  * rank-order == priority-greedy equivalence the oracle relies on, and
  * provenance of the frozen merge table. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("trainFromCounts reproduces the classic hand-worked example") {
    // Sennrich-style toy corpus: low/lower/newest/widest weighted counts.
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainFromCounts(counts, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8(newest)+... — the
    // canonical first merges are (e,s) then (es,t); tie (e,s) vs (s,t)
    // breaks lexicographically to (e,s).
    assert(merges.take(2) == List(("e", "s"), ("es", "t")))
    // every later merge's sides must already exist (char or earlier merge)
    val known = scala.collection.mutable.Set[String]() ++ ('a' to 'z').map(_.toString)
    merges.foreach { case (l, r) =>
      assert(known.contains(l) && known.contains(r), s"merge ($l,$r) uses unknown side")
      known += (l + r)
    }
  }

  test("encode with no merges is characters; merges are idempotent on saturated words") {
    assert(Bpe.encode("spark", Array.empty).toSeq == Seq("s", "p", "a", "r", "k"))
    assert(Bpe.encode("", Array.empty).isEmpty)
    val merges = Bpe.pretrainedMerges.toArray
    assert(Bpe.encode("spark", merges).toSeq == Seq("spark"))
    assert(Bpe.encode("a", merges).toSeq == Seq("a"))
  }

  test("rank-order application equals lowest-rank-first greedy (oracle equivalence)") {
    // priority-greedy reference: repeatedly merge the single
    // lowest-ranked pair present (leftmost on rank ties).
    def greedy(word: String, merges: Array[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var seg = word.map(_.toString).toVector
      var continue = true
      while (continue && seg.length > 1) {
        val cands = (0 until seg.length - 1)
          .flatMap(i => rank.get((seg(i), seg(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) continue = false
        else {
          val (r, i) = cands.min
          seg = seg.patch(i, Seq(seg(i) + seg(i + 1)), 2)
        }
      }
      seg
    }
    val merges = Bpe.pretrainedMerges.toArray
    val rnd = new scala.util.Random(13)
    val alphabet = "sparkwindowmergetablecolumvectorbigq"
    val words = (0 until 500).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    words.foreach { w =>
      assert(Bpe.encode(w, merges).toSeq == greedy(w, merges), s"divergence on '$w'")
    }
  }

  test("frozen pretrainedMerges is exactly train() on the sf0.1 corpus") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory)
    val learned = Bpe.train(Tables.documents(spark, dir), "text", numMerges = 24)
    assert(learned == Bpe.pretrainedMerges.toList,
      "frozen table drifted from the corpus it claims to be trained on")
  }

  test("BpeEncode expression matches the Scala encoder and handles nulls") {
    val merges = Bpe.pretrainedMerges
    val df = Seq(Some("customer"), Some("window"), Some("zzz"), None)
      .toDF("word")
      .select(col("word"), graft.plans.BpeEncode.bpe(col("word"), merges).as("toks"))
    val got = df.collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getSeq[String](1).toList))
    assert(got.toSeq == Seq(
      ("customer", List("c", "u", "st", "o", "mer")),
      ("window", List("window")),
      ("zzz", List("z", "z", "z")),
      (null, null)))
  }

  test("q56 produces multi-token encodings for most of the vocabulary") {
    val out = operators.Bpe.q56BpeEncode(spark, TestSpark.sf0001).collect()
    assert(out.length > 0)
    val multi = out.count(_.getLong(2) > 1)
    assert(multi > out.length / 2, s"expected mostly multi-token encodings, got $multi/${out.length}")
  }
}
