package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MgBuf, MisraGries}

/** Pure-JVM property tests of the Misra-Gries summary — the guarantee
  * q109's exact-rescore correctness argument rests on: after ANY
  * sequence of reduces and merges over n items, every item with true
  * count &gt; n/(K+1) is present, and each counter underestimates its
  * item by at most n/(K+1). */
class FreqSketchSpec extends AnyFunSuite {
  private val K = MisraGries.K

  /** Fold a stream into a summary through a seeded random merge tree,
    * exercising both reduce and merge paths the way partial aggregation
    * would: split into chunks, reduce each, merge in shuffled order. */
  private def sketch(stream: Seq[String], seed: Int): MgBuf = {
    val rnd = new scala.util.Random(seed)
    val chunks = stream.grouped(math.max(1, stream.size / (1 + rnd.nextInt(7)))).toSeq
    val partials = chunks.map(_.foldLeft(MisraGries.zero)(MisraGries.reduce))
    rnd.shuffle(partials).foldLeft(MisraGries.zero)(MisraGries.merge)
  }

  test("MG guarantee: heavy items always present, error bounded, across 20 seeds") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      // zipf-ish: item i drawn proportional to 1/(i+1); 500 distinct >> K
      val stream = Seq.fill(20000) {
        val u = rnd.nextDouble()
        s"w${math.min(499, (math.exp(u * math.log(500.0)) - 1).toInt)}"
      }
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val sk = sketch(stream, seed)
      assert(sk.n == n)
      assert(sk.items.size <= K, s"seed $seed: summary exceeded capacity")
      val bound = n / (K + 1)
      exact.filter(_._2 > bound).foreach { case (w, c) =>
        assert(sk.items.contains(w), s"seed $seed: heavy item $w (count $c) missing")
      }
      sk.items.foreach { case (w, est) =>
        val truth = exact.getOrElse(w, 0L)
        assert(est <= truth, s"seed $seed: $w overestimated ($est > $truth)")
        assert(truth - est <= bound, s"seed $seed: $w error ${truth - est} > $bound")
      }
    }
  }

  test("q109 equals the exact groupBy+HAVING answer on the corpus") {
    import TestSpark.{spark, sf0001}
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q109_heavy_hitters")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.Portable.tokenize(col("text"))).as("word"))
    val n = toks.count()
    val want = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 32 > n)
      .orderBy(desc("cnt"), asc("word"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty, "fixture must have at least one heavy hitter")
    assert(got.sameElements(want))
  }
}
