package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup cluster resolution. A pair
  * generator (q33/q42/q49) emits near-duplicate EDGES; an actual dedup
  * pipeline must then resolve them into groups and elect one canonical
  * document per group — connected components.
  *
  * The implementation is min-label propagation expressed as DataFrame
  * joins: each round every node adopts the smallest label among itself
  * and its neighbors. Rounds are pure join+groupBy plans, so Catalyst
  * partial-aggregates the `min` map-side and the per-round cost is one
  * O(E) shuffle — the same shape GraphX/GraphFrames use. Convergence
  * takes at most graph-diameter rounds; near-dup components are
  * quasi-cliques (every member close to every other), so the practical
  * diameter is 2-3. For adversarially chained graphs the alternating
  * large-star/small-star variant (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") bounds rounds at O(log n) using exactly
  * this join primitive — swap the round body, keep the loop.
  *
  * Each round ends in `localCheckpoint`: without it round k's plan
  * embeds round k-1's, and by round 10 Catalyst re-optimizes (and
  * re-executes, absent caching) an exponentially nested tree. The
  * checkpoint materializes the O(V) label table and resets lineage —
  * the standard iterative-algorithm pattern on Spark. The driver sees
  * only one scalar per round (the changed-row count used as the
  * convergence test), never the data. */
object Graph {

  /** Connected components of an undirected edge list.
    *
    * @param edges  DataFrame with two long columns `id_a`, `id_b`
    * @param maxIter safety bound on propagation rounds; exceeding it
    *                throws rather than returning a half-converged
    *                labeling (raise it for high-diameter graphs)
    * @return (id, component) — `component` is the minimum id reachable
    *         from `id`; only ids that appear in some edge are labeled */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // symmetrize once and checkpoint: the upstream pair plan (e.g. the
    // whole simhash-band candidate chain) must run ONCE, not per round
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    while (round < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("dst_label").as("nbr_label"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = next
        .join(labels.select(col("id"), col("label").as("old_label")), "id")
        .filter(col("label") =!= col("old_label"))
        .limit(1).count()
      labels = next
      round += 1
      if (changed == 0) return labels
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(graph diameter exceeds the bound — use connectedComponentsStar)")
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al.) — the high-diameter path. Where min-label
    * propagation moves the minimum ONE hop per round (a D-diameter
    * chain needs D rounds), each star round rewires whole
    * neighborhoods onto their local minimum, converging in O(log n)
    * rounds on any graph — the 2000-node chain in the spec closes in
    * a handful of rounds where [[connectedComponents]] would need
    * 2000. Per round: two groupBy(min) passes over O(E) edges, same
    * join+partial-agg shape as everything else in the engine; edges
    * stay canonical (root < child), so convergence is "the edge set
    * stopped changing", checked with one count + one anti-join count.
    *
    * large-star: every neighbor LARGER than u links to
    * min(Γ(u) ∪ {u}); small-star: every neighbor ≤ u links there too,
    * keeping u's own link. At the fixpoint every edge is (root, child)
    * with root = its component's minimum — the labeling read off
    * directly. */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    def canon(e: DataFrame): DataFrame = e
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      canon(sym.filter(col("v") > col("u")).join(mins, "u")
        .select(col("v").as("a"), col("m").as("b")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // canonical edges already have a = min endpoint: key by the LARGER
      // endpoint b, whose neighbors here are all ≤ it
      val rows = e.select(col("b").as("u"), col("a").as("v"))
      val mins = rows.groupBy("u").agg(min(col("v")).as("m"))
      canon(rows.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .union(mins.select(col("u").as("a"), col("m").as("b"))))
    }

    var e = canon(edges.select(col("id_a").as("a"), col("id_b").as("b"))).localCheckpoint()
    var round = 0
    while (round < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val changed = next.count() != e.count() ||
        next.join(e, Seq("a", "b"), "left_anti").limit(1).count() > 0
      val prev = e
      e = next
      round += 1
      if (!changed) {
        // fixpoint: edges are (root, child); roots label themselves
        return prev.select(col("b").as("id"), col("a").as("label"))
          .union(prev.select(col("a").as("id"), col("a").as("label")))
          .distinct()
      }
    }
    throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds")
  }

  /** Fixed-iteration PageRank over an undirected edge list — the second
    * iterative-graph primitive after connected components, and the same
    * per-round plan shape: one O(E) join + partial-aggregated groupBy,
    * lineage reset by `localCheckpoint` so round k never re-optimizes
    * round k-1's tree. Iteration count is FIXED (not convergence-gated)
    * so the output is a pure function of the edge list — that is what
    * makes it oracle-checkable, unlike tolerance-stopped variants whose
    * round count can differ across engines.
    *
    * Symmetrizing first means every node has degree ≥ 1, so there is no
    * dangling-mass redistribution term — the (1−d)/|V| teleport plus
    * neighbor contributions conserve total rank exactly. |V| is ONE
    * driver scalar (a count), never the data.
    *
    * @param edges two columns `id_a`, `id_b` (any atomic key type)
    * @return (id, r) — unnormalized-by-rounding PageRank after `iters`
    *         full rounds, full precision (callers round for contracts) */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint()
    val nV = deg.count()
    // empty graph: return the empty (id, r) frame BEFORE building the
    // 1/nV literal — ANSI mode constant-folds the division and throws
    // DIVIDE_BY_ZERO even though no row would ever evaluate it
    if (nV == 0) return deg.select(col("src").as("id"), lit(0.0).as("r"))
    var pr = deg.select(col("src").as("id"), (lit(1.0) / lit(nV)).as("r"))
      .localCheckpoint()
    var round = 0
    while (round < iters) {
      val contrib = sym
        .join(pr.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("deg")).as("contrib"))
      pr = pr.select("id")
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / lit(nV) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("r"))
        .localCheckpoint()
      round += 1
    }
    pr
  }

  /** q110: TextRank keyword extraction (Mihalcea &amp; Tarau '04) — PageRank
    * over the word co-occurrence graph, the classic unsupervised
    * keyword/importance scorer a corpus-curation pipeline uses to pick
    * salient vocabulary without labels. Nodes are corpus words, edges
    * are distinct adjacent-token pairs (the q74 transition stream,
    * deduplicated and canonicalized; self-loops dropped). Scores round
    * to 6 decimals — ten rounds of double arithmetic reassociate at
    * ~1e-15, far under the rounding grain, so the DuckDB unrolled twin
    * hashes identically. */
  def q110TextRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("id_a"),
        greatest(col("w1"), col("w2")).as("id_b"))
      .distinct()
    pageRank(edges, iters = 10, damping = 0.85)
      .select(col("id").as("word"), round(col("r"), 6).as("rank"))
      .orderBy(desc("rank"), asc("word"))
  }

  /** Per-node triangle counts of an undirected graph via DEGREE-ORDERED
    * edge orientation — the standard scalable enumeration (Cohen,
    * "Graph Twiddling in a MapReduce World"): orient every edge from
    * its lower-(degree, id) endpoint to the higher one; each triangle
    * then has exactly one apex with two out-edges, so self-joining the
    * oriented list on the apex and probing the third side counts every
    * triangle exactly once. The payoff at scale: max out-degree under
    * this orientation is O(√E) on ANY graph — a celebrity node with
    * millions of neighbors receives edges instead of emitting them, so
    * the apex self-join's per-key fanout is bounded where a naive
    * wedge join explodes. Three hash joins + one groupBy; integer
    * arithmetic only, so the oracle twin is exact with no rounding
    * contract at all.
    *
    * @param edges undirected (id_a, id_b); dedup/canonicalization done
    *              here, self-loops dropped
    * @return (id, n_triangles) for nodes on ≥ 1 triangle */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("id")).union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): a before b iff (deg_a, a) < (deg_b, b)
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val or = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dst_deg"))
      .localCheckpoint() // three consumers below; cut the shared prefix
    val o1 = or.select(col("src"), col("dst").as("v"), col("dst_deg").as("kv"))
    val o2 = or.select(col("src"), col("dst").as("w"), col("dst_deg").as("kw"))
    val tri = o1.join(o2, "src")
      .filter(col("kv") < col("kw") || (col("kv") === col("kw") && col("v") < col("w")))
      .join(or.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("src").as("u"), col("v"), col("w"))
    tri.select(col("u").as("id"))
      .union(tri.select(col("v").as("id")))
      .union(tri.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Personalized PageRank (the random walk teleports to the SEED set,
    * not uniformly) — the "related nodes" primitive behind query
    * expansion and graph-based recommendation: rank mass concentrates
    * around the seeds instead of spreading to global hubs. Same
    * fixed-iteration join+groupBy rounds as [[pageRank]] (each round
    * one O(E) shuffle, localCheckpoint lineage cut); the only changes
    * are the start vector (1/|S| on seeds) and the teleport term
    * ((1−d)/|S| on seeds, 0 elsewhere). Seeds outside the graph are
    * ignored; an empty effective seed set returns the empty frame. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint()
    val seedIds = seeds.select(col("id")).distinct()
      .join(deg.select(col("src").as("id")), Seq("id"))
      .localCheckpoint()
    val nS = seedIds.count()
    if (nS == 0) return deg.limit(0).select(col("src").as("id"), lit(0.0).as("r"))
    val tele = seedIds.select(col("id"), (lit(1.0) / lit(nS)).as("t"))
      .localCheckpoint()
    var pr = deg.select(col("src").as("id"))
      .join(tele, Seq("id"), "left")
      .select(col("id"), coalesce(col("t"), lit(0.0)).as("r"))
      .localCheckpoint()
    var round = 0
    while (round < iters) {
      val contrib = sym
        .join(pr.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("deg")).as("contrib"))
      pr = pr.select("id")
        .join(contrib, Seq("id"), "left")
        .join(tele, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * coalesce(col("t"), lit(0.0)) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("r"))
        .localCheckpoint()
      round += 1
    }
    pr
  }

  /** q132: words related to the lexicographically smallest vocabulary
    * word via personalized PageRank over the co-occurrence graph — the
    * query-expansion view (q110 ranks globally; this ranks AROUND a
    * seed). The seed choice is a pure function of the corpus, so the
    * query stays oracle-checkable. */
  def q132PersonalizedPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("id_a"),
        greatest(col("w1"), col("w2")).as("id_b"))
      .distinct()
    val seed = edges.select(least(min("id_a"), min("id_b")).as("id"))
    personalizedPageRank(edges, seed, iters = 10, damping = 0.85)
      .select(col("id").as("word"), round(col("r"), 6).as("rank"))
      .orderBy(desc("rank"), asc("word"))
  }

  /** Synchronous label propagation (Raghavan et al. '07) made
    * deterministic: every node starts labeled with itself; each round,
    * every node adopts the most frequent label among its NEIGHBORS,
    * ties broken by lexicographically smallest label; a fixed round
    * count makes the result a pure function of the edge list (the
    * q110 fixed-iteration contract), hence oracle-checkable. Unlike
    * connectedComponents' min-label fixpoint, frequency voting finds
    * DENSE communities — a bridge edge between two cliques doesn't
    * merge them, because one vote loses to the clique majority.
    *
    * Per round: one join of the O(E) symmetric edge list against the
    * O(V) label table, a (node, label) partial-aggregated count, and a
    * per-node top-1 window — all key-partitioned; localCheckpoint per
    * round cuts the recursive lineage (the [[connectedComponents]]
    * rule). */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    val top = Window.partitionBy("node")
      .orderBy(desc("votes"), asc("label"))
    (1 to iters).foreach { _ =>
      labels = sym
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(top))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    labels
  }

  /** q128: communities of the q110 word co-occurrence graph via 3
    * deterministic label-propagation rounds — the curation view that
    * groups vocabulary into topical clusters where q68's connected
    * components would glue everything reachable into one blob. */
  def q128LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("id_a"),
        greatest(col("w1"), col("w2")).as("id_b"))
      .distinct()
    labelPropagation(edges, iters = 3)
      .select(col("node").as("word"), col("label"))
      .orderBy("word")
  }

  /** q117: triangle counts over the q110 word co-occurrence graph —
    * the local-clustering signal (which vocabulary sits in tightly
    * interlinked contexts) and the second declared consumer of the
    * co-occurrence edge list. */
  def q117Triangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(col("w1").as("id_a"), col("w2").as("id_b"))
    triangleCounts(edges)
      .select(col("id").as("word"), col("n_triangles"))
      .orderBy(desc("n_triangles"), asc("word"))
  }

  /** Single-source shortest paths by `iters` synchronous Bellman-Ford
    * relaxation rounds over a weighted symmetric edge list
    * (src, dst, w) — the weighted companion to [[connectedComponents]]'
    * min-label fixpoint. Fixed iteration count (the q110 contract):
    * after r rounds the table holds exact distances for every node
    * within r hops of the source, a pure function of (edges, source),
    * hence oracle-checkable as an unrolled CTE. Each accumulated
    * distance rounds at 6 dp so both engines relax identical doubles
    * (the q113 convention).
    *
    * Per round: one join of the O(V) frontier against the edge list +
    * one min-groupBy — both key-partitioned; localCheckpoint cuts the
    * recursive lineage. At 100 TB the graph table is the small side
    * (vocabulary-capped, the q110 argument); rounds never touch the
    * corpus. */
  def shortestPaths(wedges: DataFrame, source: DataFrame,
                    iters: Int): DataFrame = {
    // cut the edge-build lineage ONCE (the pageRank `sym` rule) — the
    // graph is vocabulary-capped, but its lineage reaches back through
    // the corpus scan, and 8 un-checkpointed rounds re-scan the corpus
    // 8 times (measured 44 s → 6 s at 100× docs)
    val e = wedges.localCheckpoint()
    var dist = source.select(col("id"), lit(0.0).as("d")).localCheckpoint()
    var r = 0
    while (r < iters) {
      val relax = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), round(dist("d") + e("w"), 6).as("d"))
      dist = dist.unionByName(relax)
        .groupBy("id").agg(min("d").as("d"))
        .localCheckpoint()
      r += 1
    }
    dist
  }

  /** q147: cheapest association paths from the seed word over the
    * WEIGHTED co-occurrence graph — edge cost ln(1 + N/cnt) (frequent
    * co-occurrence = short hop), so the distance ranks how tightly
    * each vocabulary word associates with the seed through any chain
    * of contexts: the graph-distance cousin of q132's random-walk
    * relatedness (PPR rewards MANY paths; this rewards the single
    * strongest one). Seed = deterministic min word (the q132 rule);
    * 8 relaxation rounds exceed the vocabulary graph's diameter. */
  def q147ShortestPaths(spark: SparkSession, dir: String): DataFrame = {
    val pc = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("double").as("cnt"))
    val tot = pc.agg(sum("cnt").as("n"))
    val half = pc.crossJoin(broadcast(tot)) // 1-row total × O(E) edges
      .select(col("a"), col("b"),
        round(log(lit(1.0) + col("n") / col("cnt")), 6).as("w"))
    val wedges = half.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(half.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val seed = wedges.select(least(min("src"), min("dst")).as("id"))
    shortestPaths(wedges, seed, iters = 8)
      .select(col("id").as("word"), round(col("d"), 6).as("dist"))
      .orderBy("dist", "word")
  }

  /** Walk shape for [[q171DeepWalk]]: top-N start words, walks per
    * start, transitions per walk (8-node paths). */
  val WalkStarts = 20
  val WalksPerStart = 2
  val WalkSteps = 7

  /** q171: DeepWalk corpus generation (Perozzi et al. 2014) — random
    * walks over the bigram transition graph, emitted as token
    * sequences. This is the graph-to-sequence bridge back to the
    * reference's own model: DeepWalk's whole insight is that walk
    * corpora feed word2vec UNCHANGED, so these paths are literal
    * training input for the q40 embedding trainer — graph embeddings
    * from the same Spark pipeline, no new trainer.
    *
    * "Random" is DERIVED, never drawn (the q153/q45b determinism rule,
    * here applied to a CHOICE instead of a weight): at node v, step t,
    * walk w the chooser is r = mmix(tokenId(v), 100·w + t) mod out(v) —
    * pure integer arithmetic — and the walk takes the successor whose
    * cumulative-count interval [cum − cnt, cum) contains r, i.e. a
    * frequency-proportional draw from a common random sequence. Both
    * engines (and any two cluster runs) walk the SAME paths, so the
    * oracle replays every transition bit-for-bit through
    * [[WalkSteps]] unrolled CTEs (the q110/q147/q163 fixed-iteration
    * rule). Dead ends self-resolve: a node with no successors simply
    * stops extending (left-join miss keeps cur/path unchanged).
    *
    * Scale shape: bigrams extract IN-ROW (zip of adjacent tokens, no
    * corpus shuffle before the edge groupBy); the edge table with
    * per-source cumulative counts is vocabulary-capped (the q110
    * argument — this IS q110's graph family) and localCheckpointed
    * once; each step is a broadcast left join of the O(starts × walks)
    * frontier against it. The corpus is touched exactly once. */
  def q171DeepWalk(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000000007L
    def mmix(key: org.apache.spark.sql.Column, salt: org.apache.spark.sql.Column) =
      pmod(pmod(pmod(pmod(key, lit(m)) * lit(1000003L), lit(m))
        + salt * lit(7919L), lit(m)) * lit(69069L), lit(m))
    val toks = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(graft.functions.Portable.tokenize(col("text")).as("ws"))
      .persist() // edge build + start shortlist share the scan
    try {
      val bigrams = toks.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS v, element_at(ws, i + 1) AS u))"))
          .as("p"))
        .groupBy(col("p.v").as("v"), col("p.u").as("u"))
        .agg(count(lit(1)).as("cnt"))
      val bySucc = Window.partitionBy("v").orderBy(col("cnt").desc, col("u").asc)
      val edges = bigrams
        .withColumn("cum", sum("cnt").over(
          bySucc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("cnt").over(Window.partitionBy("v")))
        .localCheckpoint(eager = true) // vocabulary-capped; 7 join consumers
      val starts = toks.select(explode(col("ws")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word").asc).limit(WalkStarts)
        .select(col("word").as("start"))
      var frontier = starts
        .select(col("start"), explode(sequence(lit(0L),
          lit(WalksPerStart - 1L))).as("walk"))
        .select(col("start"), col("walk"),
          col("start").as("cur"), col("start").as("path"))
      for (t <- 1 to WalkSteps) {
        val r = pmod(mmix(graft.plans.TokenId.tokenId(col("cur")),
          col("walk") * lit(100L) + lit(t.toLong)), col("tot"))
        frontier = frontier.join(broadcast(edges),
            col("v") === col("cur") &&
              r >= col("cum") - col("cnt") && r < col("cum"), "left")
          .select(col("start"), col("walk"),
            coalesce(col("u"), col("cur")).as("cur"),
            when(col("u").isNull, col("path"))
              .otherwise(concat_ws(" ", col("path"), col("u"))).as("path"))
      }
      val out = frontier
        .select(col("start").as("start_word"), col("walk").as("walk_id"),
          col("path"),
          size(split(col("path"), " ")).cast("long").as("n_nodes"))
        .orderBy("start_word", "walk_id")
      val rows = out.collect() // O(starts × walks) by construction;
                               // eager so the token cache releases
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally toks.unpersist()
  }

  /** q198: graph summary + degree assortativity of the bigram word
    * graph — Newman's r (2002): the Pearson correlation of endpoint
    * degrees over every (directed-symmetrized) edge. r < 0 means hubs
    * attach to leaves (the disassortative shape natural language
    * produces — function words hub everything); r drifting toward 0/+
    * on a corpus snapshot is template/boilerplate structure distorting
    * the co-occurrence topology — a graph-level companion to q188's
    * Zipf slope over the SAME vocabulary-capped graph q110/q117/q147
    * analyze.
    *
    * All five correlation moments (Σx, Σy, Σxy, Σx², Σy²) accumulate
    * as EXACT integers/decimals over the edge frame (degrees are
    * integers — the q155 rule needs no grid here), so r is a single
    * closed-form double both engines derive identically. Corpus cost
    * is the one tokenize scan behind `transitions`; the edge and
    * degree frames are vocabulary-bounded, and the degree join is a
    * bounded-frame hash join. */
  /** q215: global clustering coefficient of the bigram graph —
    * C = 3·triangles / wedges (wedges = Σ_v deg(v)(deg(v)−1)/2): the
    * scalar transitivity measure over the same vocabulary-capped graph
    * q117 enumerates and q198 correlates. Natural co-occurrence graphs
    * cluster strongly (topics close triangles); a collapse toward the
    * random-graph baseline is the same template-distortion smell as a
    * flat q188 slope, measured on topology instead of frequency.
    * Triangle cost is q117's O(√E)-oriented enumeration; wedges are
    * exact integer arithmetic on the degree frame; one division. */
  def q215ClusteringCoefficient(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("id_a"),
        greatest(col("w1"), col("w2")).as("id_b"))
      .distinct()
      .localCheckpoint() // feeds degrees AND the triangle enumeration
    val deg = edges.select(col("id_a").as("id"))
      .union(edges.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val degAgg = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(deg * (deg - 1)) DIV 2").cast("decimal(38,0)")).as("wedges"))
    // q117's per-node counts sum each triangle exactly 3 times
    val triAgg = triangleCounts(edges)
      .agg(coalesce(expr("sum(n_triangles) DIV 3"), lit(0L)).as("n_triangles"))
    val m = edges.agg(count(lit(1)).as("n_edges"))
    degAgg.crossJoin(broadcast(triAgg)).crossJoin(broadcast(m))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("wedges").cast("long").as("n_wedges"),
        when(col("wedges") > 0,
          round(lit(3.0) * col("n_triangles").cast("double")
            / col("wedges").cast("double"), 6)).as("global_clustering"))
      .orderBy("n_nodes")
  }

  def q198Assortativity(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct()
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint() // vocabulary-bounded; feeds degrees + moments
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val joined = sym
      .join(deg.select(col("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")), "dst")
    val m = joined.agg(
      count(lit(1)).as("m"),
      sum(col("dx").cast("decimal(38,0)")).as("sx"),
      sum(col("dy").cast("decimal(38,0)")).as("sy"),
      sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
      sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
      sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("syy"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      max("deg").as("max_degree"))
    val md = col("m").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val num = md * col("sxy").cast("double") - sx * sy
    val den = sqrt(md * col("sxx").cast("double") - sx * sx) *
      sqrt(md * col("syy").cast("double") - sy * sy)
    m.crossJoin(broadcast(nodes)) // 1 row × 1 row
      .select(col("n_nodes"),
        expr("m DIV 2").as("n_edges"),
        // empty-corpus guard: ANSI division by a zero node count throws
        when(col("n_nodes") > 0,
          round(md / col("n_nodes").cast("double"), 4)).as("mean_degree"),
        col("max_degree"),
        when(den > 0, round(num / den, 6)).as("assortativity"))
      .orderBy("n_nodes")
  }

  /** Peeling rounds for [[q234KCore]] — fixed, never convergence-gated
    * (the q110/q116 cross-engine rule); 10 rounds reach the fixpoint
    * on every fixture and the CONTRACT is "the subgraph after 10
    * peels", so a pathological deep-peel graph still matches. */
  val CoreRounds = 10
  /** Core orders reported by q234. */
  val CoreKs: Seq[Int] = Seq(2, 3)

  /** q234: k-core decomposition of the bigram word graph — iteratively
    * peel nodes of degree &lt; k; what survives is the graph's dense
    * backbone (Seidman 1983). On a text graph the 2-core separates
    * connective vocabulary from one-off fringe words, and the 3-core
    * is the template/boilerplate skeleton — the STRUCTURAL complement
    * to q110's TextRank scores (rank says important; core says
    * embedded in dense structure). k ∈ [[CoreKs]], [[CoreRounds]]
    * unrolled peels.
    *
    * Scale shape: each peel is one degree aggregate + two key joins on
    * the vocabulary-capped edge list (never the corpus), with a
    * localCheckpoint lineage cut per round (the q132/q110 pattern);
    * rounds × ks is a fixed constant. */
  def q234KCore(spark: SparkSession, dir: String): DataFrame = {
    val ed0 = TextAnalysis.transitions(spark, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct()
      .localCheckpoint()
    CoreKs.map { k =>
      var ed = ed0
      var r = 0
      while (r < CoreRounds) {
        val keep = ed.select(col("a").as("id"))
          .union(ed.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select("id")
        ed = ed
          .join(keep.select(col("id").as("a")), "a")
          .join(keep.select(col("id").as("b")), "b")
          .select("a", "b")
          .localCheckpoint()
        r += 1
      }
      val nodes = ed.select(col("a").as("id"))
        .union(ed.select(col("b").as("id"))).distinct()
        .agg(count(lit(1)).as("n_nodes"))
      val maxDeg = ed.select(col("a").as("id"))
        .union(ed.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .agg(coalesce(max("deg"), lit(0L)).as("max_core_degree"))
      ed.agg(count(lit(1)).as("n_edges"))
        .crossJoin(nodes).crossJoin(maxDeg)
        .select(lit(k.toLong).as("k"), col("n_nodes"), col("n_edges"),
          col("max_core_degree"))
    }.reduce(_ unionAll _).orderBy("k")
  }
}
