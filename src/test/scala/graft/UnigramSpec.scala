package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM tokenizer correctness: the declared queries are
  * rows-only (Viterbi DP has no faithful SQL rendering), so this spec
  * carries the full correctness budget — exhaustive-optimality against
  * brute-force segmentation enumeration, EM likelihood monotonicity,
  * and frozen-artifact parity (the BpeSpec contract). */
class UnigramSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  // a vocab with genuine subword structure (the corpus fixpoint is
  // whole-words; real subword behavior is proven here)
  private val subVocab: Map[String, Double] = Map(
    "un" -> -2.0, "believ" -> -3.0, "able" -> -2.5, "ing" -> -2.2,
    "walk" -> -2.8, "talk" -> -2.9, "s" -> -4.0) ++
    ('a' to 'z').map(c => c.toString -> -8.0).toMap

  /** All segmentations of `w` into vocab pieces (≤ 2^(n−1), test-only). */
  private def allSegs(w: String, vocab: Map[String, Double]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to w.length).flatMap { k =>
      val (h, t) = (w.substring(0, k), w.substring(k))
      if (vocab.contains(h)) allSegs(t, vocab).map(h +: _) else Seq.empty
    }

  test("viterbi returns the maximum-score segmentation (exhaustive check)") {
    val words = Seq("unbelievable", "walking", "talks", "unable",
      "believing", "walkable", "zzz", "a")
    words.foreach { w =>
      val (pieces, score) = Unigram.viterbi(w, subVocab)
      assert(pieces.mkString == w, s"$w: pieces must concatenate back")
      val best = allSegs(w, subVocab)
        .map(seg => seg.map(subVocab).sum).max
      assert(math.abs(score - best) < 1e-12,
        s"$w: viterbi $score vs brute-force best $best")
    }
  }

  test("viterbi optimality holds under 25 seeded random vocab/word draws") {
    // the exhaustive fixture pins known regimes; this sweep guards the
    // DP's edges (piece lengths at the maxPieceLen boundary, dense tie
    // fields, single-char-only tails) across random instances
    val rnd = new scala.util.Random(20260814L)
    (1 to 25).foreach { trial =>
      val alpha = "abcd" // small alphabet ⇒ dense piece overlap
      def randWord(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = (1 to 12).map(_ => randWord(1 + rnd.nextInt(5))).distinct
      val vocab = (pieces.map(p => p -> -(1.0 + rnd.nextInt(60) / 10.0)) ++
        alpha.map(c => c.toString -> -8.0)).toMap
      val word = randWord(4 + rnd.nextInt(8)) // ≤ 11 chars: 2^10 segs max
      val (seg, score) = Unigram.viterbi(word, vocab)
      assert(seg.mkString == word, s"trial $trial: identity on $word")
      val best = allSegs(word, vocab).map(s => s.map(vocab).sum).max
      assert(math.abs(score - best) < 1e-12,
        s"trial $trial: $word viterbi $score vs brute $best (vocab $vocab)")
    }
  }

  test("viterbi picks linguistic subwords over char fallbacks") {
    assert(Unigram.viterbi("unbelievable", subVocab)._1.toSeq ==
      Seq("un", "believ", "able"))
    assert(Unigram.viterbi("walking", subVocab)._1.toSeq == Seq("walk", "ing"))
    assert(Unigram.viterbi("talks", subVocab)._1.toSeq == Seq("talk", "s"))
  }

  test("uncovered characters fall back to the floor instead of failing") {
    val vocab = Map("ab" -> -1.0, "a" -> -3.0, "b" -> -3.0) // no 'x'
    val (pieces, score) = Unigram.viterbi("axb", vocab)
    assert(pieces.mkString == "axb" && pieces.contains("x"))
    assert(score < -1e8, "floor score must mark the fallback")
  }

  test("EM rounds never decrease the corpus likelihood") {
    val counts = Seq(("walking", 30L), ("talking", 25L), ("walks", 20L),
      ("talks", 15L), ("unbelievable", 10L), ("believable", 8L))
    var logp = Unigram.seedCandidates(counts, maxPieces = 256)
    var prev = Double.NegativeInfinity
    (1 to 4).foreach { r =>
      val (next, ll) = Unigram.emRound(counts, logp)
      assert(ll >= prev - 1e-9, s"round $r: likelihood fell $prev -> $ll")
      prev = ll; logp = next
    }
  }

  test("pruning respects the vocab budget and never drops single chars") {
    val counts = Seq(("walking", 10L), ("talking", 10L))
    val seeded = Unigram.seedCandidates(counts, maxPieces = 128)
    val chars = seeded.keySet.filter(_.length == 1)
    val pruned = Unigram.prune(counts, seeded, vocabSize = chars.size + 4,
      shrink = 1.0)
    assert(chars.subsetOf(pruned.keySet), "single chars are never pruned")
    assert(pruned.size <= chars.size + 4)
    // probabilities stay normalized after the prune refit
    assert(math.abs(pruned.values.map(math.exp).sum - 1.0) < 1e-9)
  }

  test("trained table segments the training words as whole pieces") {
    val counts = Seq(("spark", 50L), ("stream", 40L), ("join", 30L))
    val logp = Unigram.trainFromCounts(counts, vocabSize = 40)
    counts.foreach { case (w, _) =>
      assert(Unigram.viterbi(w, logp)._1.toSeq == Seq(w),
        s"high-frequency training word $w must become one piece")
    }
  }

  test("frozen artifact matches a live sf0.1 retrain (staleness pin)") {
    val live = Unigram.train(
      Tables.documents(spark, "/root/testdata/sf0.1"), "text", vocabSize = 96)
      .filter(_._2 > -30) // the frozen cutoff: pieces the fit uses
      .map { case (p, lp) => p -> math.round(lp * 1000000).toDouble / 1000000 }
    assert(live == Unigram.pretrainedPieces.toMap,
      "pretrainedPieces is stale — regenerate from Unigram.train @ sf0.1")
  }

  test("q145 encode: identity, closure, and negative scores over the corpus dictionary") {
    val rows = SparkEntry.queries("q145_unigram_encode")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val vocab = Unigram.pretrainedPieces.toMap
    rows.foreach { r =>
      val (w, pieces) = (r.getString(0), r.getString(1).split(" ").toSeq)
      assert(pieces.mkString == w, s"$w: segmentation identity")
      assert(r.getLong(2) == pieces.length)
      pieces.foreach(p => assert(vocab.contains(p) || p.length == 1,
        s"$w: piece $p outside the closed vocabulary"))
      assert(r.getDouble(3) < 0, s"$w: log score must be negative")
      // the DuckDB oracle unrolls the Viterbi DP over 12 positions
      // (SparkEntry q145 oracle comment) — a longer dictionary word in
      // a future fixture must fail HERE, not silently hash-diverge
      assert(w.length <= 12, s"$w: exceeds the oracle's 12-position DP unroll")
    }
  }

  test("q146 live train emits a ranked normalized piece table") {
    val rows = SparkEntry.queries("q146_unigram_train")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length))
    val probSum = rows.map(r => math.exp(r.getDouble(1))).sum
    // ranks strictly ordered by logp desc; probs ~normalized (4 dp rounding)
    assert(math.abs(probSum - 1.0) < 0.01, s"prob mass $probSum")
    val lps = rows.map(_.getDouble(1))
    assert(lps.zip(lps.tail).forall { case (a, b) => a >= b })
  }
}
