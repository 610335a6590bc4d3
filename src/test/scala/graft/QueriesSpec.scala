package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local("4")
}

class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows at sf0.001") {
    Registry.ops.foreach { op =>
      val n = op.fn(spark, sf).count()
      assert(n > 0, s"${op.name} returned 0 rows")
    }
  }

  test("every oracle belongs to a registered query") {
    val names = Registry.ops.map(_.name).toSet
    assert(Registry.oracleSql.keySet.subsetOf(names))
  }

  test("q1 aggregates one row per (year, month, symbol)") {
    val rows = Registry.queries("q1_partition_counts")(spark, sf).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getString(2))).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("trade_count")).sum > 0)
  }

  test("etl_normalize drops zero-quantity rows (DQ gate)") {
    val total = Tables.events(spark, sf).count()
    val clean = Registry.queries("etl_normalize")(spark, sf).count()
    assert(clean < total)
    assert(clean > total / 2)
  }

  test("q5 whale rows are the per-symbol top 1% by trade value") {
    val df = Registry.queries("q5_whale")(spark, sf)
    assert(df.count() <= 100)
    val vals = df.select("quote_qty").collect().map(_.getDouble(0))
    assert(vals.forall(_ > 0))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q16 default capacity routes every driver-scale group exact (== q15)") {
    import org.apache.spark.sql.functions._
    val q15 = Registry.queries("q15_quantiles")(spark, sf)
      .select("symbol", "n_trades", "p50", "p90", "p99").collect()
    val q16 = Registry.queries("q16_quantiles_sketch")(spark, sf)
    assert(q16.select("regime").distinct().collect().map(_.getString(0)).toSeq == Seq("exact"))
    val got = q16.select("symbol", "n_trades", "p50", "p90", "p99").collect()
    assert(got.map(_.toSeq).toSeq == q15.map(_.toSeq).toSeq)
  }

  test("q16 sketch regime (aggressive cap) stays within percentile_approx rank bound") {
    import org.apache.spark.sql.functions._
    // cap=50 forces every sf0.001 group (~200 rows) through the sketch;
    // percentile_approx(accuracy=5000) guarantees rank error ≤ n/5000
    val exactRanks = Registry.queries("q15_quantiles")(spark, sf)
    val sketch = operators.MarketQueries.q16At(50)(spark, sf)
    assert(sketch.select("regime").distinct().collect().map(_.getString(0)).toSeq == Seq("sketch"))
    val trades = Registry.queries("etl_normalize")(spark, sf)
      .select("symbol", "price")
    val joined = sketch.join(exactRanks.select(col("symbol"), col("n_trades").as("n_exact")), "symbol")
    for (r <- joined.collect(); (p, idx) <- Seq((0.50, "p50"), (0.90, "p90"), (0.99, "p99"))) {
      val sym = r.getAs[String]("symbol")
      val n = r.getAs[Long]("n_exact")
      val v = r.getAs[Double](idx)
      val rank = trades.filter(col("symbol") === sym && col("price") <= v).count()
      val target = math.ceil(p * n).toLong
      val tol = math.max(1L, n / 5000 + 1)
      assert(math.abs(rank - target) <= tol,
        s"$sym $idx: value $v has rank $rank, target $target ± $tol (n=$n)")
    }
  }

  test("q25 default capacity routes exact; aggressive cap bounds the t-digest") {
    import org.apache.spark.sql.functions._
    // default cap: exact regime, bit-identical to q15
    val q15 = Registry.queries("q15_quantiles")(spark, sf)
      .select("symbol", "n_trades", "p50", "p90", "p99").collect()
    val dflt = Registry.queries("q25_tdigest_quantiles")(spark, sf)
    assert(dflt.select("regime").distinct().collect().map(_.getString(0)).toSeq == Seq("exact"))
    assert(dflt.select("symbol", "n_trades", "p50", "p90", "p99").collect()
      .map(_.toSeq).toSeq == q15.map(_.toSeq).toSeq)
    // cap=50 forces the t-digest; k1 scale at compression 100: centroid
    // weight near the median is ~n/25 worst-case (rank error ≤ half of
    // that); capacity shrinks toward the tails, so p99 is tighter
    val exactRanks = Registry.queries("q15_quantiles")(spark, sf)
    val sketch = operators.MarketQueries.q25At(50)(spark, sf)
    assert(sketch.select("regime").distinct().collect().map(_.getString(0)).toSeq == Seq("sketch"))
    val trades = Registry.queries("etl_normalize")(spark, sf)
      .select("symbol", "price")
    val joined = sketch.join(
      exactRanks.select(col("symbol"), col("n_trades").as("n_exact")), "symbol")
    for (r <- joined.collect();
         (p, idx, frac) <- Seq((0.50, "p50", 50L), (0.90, "p90", 50L), (0.99, "p99", 100L))) {
      val sym = r.getAs[String]("symbol")
      val n = r.getAs[Long]("n_exact")
      val v = r.getAs[Double](idx)
      val rank = trades.filter(col("symbol") === sym && col("price") <= v).count()
      val target = math.ceil(p * n).toLong
      val tol = math.max(2L, n / frac)
      assert(math.abs(rank - target) <= tol,
        s"$sym $idx: value $v has rank $rank, target $target ± $tol (n=$n)")
    }
  }

  test("q17 is exact below capacity and HLL-bounded above an aggressive cap") {
    import org.apache.spark.sql.functions._
    val exact = Registry.queries("etl_normalize")(spark, sf)
      .groupBy("symbol").agg(countDistinct(col("trade_id")).as("ndv_exact"))
    // default cap: exact regime — KMV holds the full distinct-hash set
    // (32-bit collisions ≲1 expected at this scale, allow 2)
    val dflt = Registry.queries("q17_distinct_sketch")(spark, sf)
    for (r <- dflt.join(exact, "symbol").collect()) {
      assert(r.getAs[String]("regime") == "exact")
      assert(math.abs(r.getAs[Long]("ndv_trades") - r.getAs[Long]("ndv_exact")) <= 2,
        s"${r.getAs[String]("symbol")}: kmv ${r.getAs[Long]("ndv_trades")} vs exact ${r.getAs[Long]("ndv_exact")}")
    }
    // cap=16 forces the HLL regime; rsd 0.02 ⇒ ±10% is a 5-sigma bound
    val hll = operators.MarketQueries.q17At(16)(spark, sf)
    for (r <- hll.join(exact, "symbol").collect()) {
      assert(r.getAs[String]("regime") == "hll")
      val approx = r.getAs[Long]("ndv_trades").toDouble
      val ex = r.getAs[Long]("ndv_exact").toDouble
      assert(math.abs(approx - ex) / ex <= 0.10,
        s"${r.getAs[String]("symbol")}: approx $approx vs exact $ex")
    }
  }

  test("BPE trainer: hand-computed merges, greedy overlap, frequency weighting") {
    import spark.implicits._
    // vocabulary after the pre-tokenizer: "aaa" (wc 2), "bb" (wc 5);
    // "Z$" fails the [a-z0-9]+ normalizer and "b" the length floor
    val docs = Seq("aaa aaa bb bb bb", "bb bb Z$ b").toDF("text")
    val m = operators.TextAnalysis.bpeTrainOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // round 1: (b,b) weighted 5 beats (a,a) weighted 2·2=4
    // round 2: (a,a) — greedy left-to-right merges ONLY pos 0 of
    //          a-a-a (the overlap at pos 1 is consumed) → [aa, a]
    // round 3: (aa,a) completes the word; rounds 4-6 find no pairs
    assert(m.toSeq == Seq(
      (1, "b", "b", "bb", 5L),
      (2, "a", "a", "aa", 4L),
      (3, "aa", "a", "aaa", 2L)), m.toSeq.toString)
  }

  test("wordpiece trainer: likelihood selection beats raw frequency; vocab splits by position") {
    import spark.implicits._
    // wf: aa → 10, bc → 9. Pair counts: (a,a)=10 > (b,c)=9, so BPE
    // would merge (a,a) first — but WordPiece scores cnt/(cnt_l·cnt_r):
    // (b,c) = 9/(9·9) beats (a,a) = 10/(20·20). Exact ppt keys:
    // 9·10¹²//81 = 111111111111, 10·10¹²//400 = 25000000000.
    val docs = Seq(
      (Seq.fill(10)("aa") ++ Seq.fill(9)("bc")).mkString(" ")
    ).map(Tuple1(_)).toDF("text")
    val (rules, ivoc, cvoc) = operators.TextAnalysis.wpTrainOf(docs)
    assert(rules == Seq(
      (1, "b", "c", 9L, 9L, 9L, 111111111111L),
      (2, "a", "a", 10L, 20L, 20L, 25000000000L)), rules.toString)
    // final state: aa → [aa@0], bc → [bc@0]; vocab = positional
    // symbols + the char floor, word-initial vs continuation
    assert(ivoc == Seq("a", "aa", "b", "bc", "c"), ivoc.toString)
    assert(cvoc == Seq("a", "b", "c"), cvoc.toString)
  }

  test("wordpiece apply: greedy longest-match commits to UNK where a lattice would segment") {
    import spark.implicits._
    // ivoc {a, ab}, cvoc {b, bc}: word "abc" — greedy takes the
    // LONGEST initial piece "ab", then "c" has no continuation match,
    // so the whole word is one [UNK] — even though "a"+"bc" segments.
    // "abb" = ab + b (continuation table), "ab" = one initial piece.
    val docs = Seq((1L, "abc"), (2L, "abb ab")).toDF("doc_id", "text")
    val out = operators.TextAnalysis
      .wpApplyWith(docs, Seq("a", "ab"), Seq("b", "bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1L, 1.0),
      (2L, 2L, 3L, 0L, 1.5)), out.toSeq.toString)
  }

  test("wordpiece apply under an EMPTY vocab rolls every word up as [UNK]") {
    import spark.implicits._
    // r16 ADVICE: a degenerate journal/corpus where no word passes the
    // >=2 lowercase-alnum pre-tokenizer cut trains EMPTY vocab tables;
    // the apply path must not throw on the maxK reduction — the
    // correct WordPiece verdict is all-UNK.
    val docs = Seq((1L, "ab cd"), (2L, "x")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.wpApplyWith(docs, Seq.empty, Seq.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 1L)), out.toSeq.toString)
  }

  test("wordpiece apply on the lake: UNK-free rows have fertility >= 1") {
    val rows = Registry.queries("tokenizer_wordpiece_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getLong(3) == 0L)
        assert(r.getLong(2) >= r.getLong(1), s"fertility < 1: $r")
      assert(r.getLong(2) >= 1L)
    }
  }

  test("fertility report replays from the three apply ops per source") {
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def perDoc(op: String, cols: Int) =
      Registry.queries(op)(spark, sf).collect()
        .map(r => r.getLong(0) -> (1 to cols).map(r.getLong(_)))
    val b = perDoc("tokenizer_bpe_apply", 2).toMap
    val u = perDoc("tokenizer_unigram_apply", 2).toMap
    val w = perDoc("tokenizer_wordpiece_apply", 3).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Registry.queries("tokenizer_fertility_report")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val bySrc = src.keys.toSeq.groupBy(src)
    assert(got.keySet == bySrc.keySet)
    for ((s0, ids) <- bySrc) {
      def agg(m: Map[Long, Seq[Long]], i: Int) = ids.map(m(_)(i)).sum.toDouble
      val want = (ids.size.toLong,
        r6(agg(b, 1) / agg(b, 0)), r6(agg(u, 1) / agg(u, 0)),
        r6(agg(w, 1) / agg(w, 0)), r6(agg(w, 2) / agg(w, 0)))
      assert(got(s0) == want, s"$s0: ${got(s0)} != $want")
    }
  }

  test("unigram trainer: full pipeline replays independently; frequent chunk becomes a piece") {
    import spark.implicits._
    // 'abab' is frequent enough that p(abab) beats p(ab)^2 (one piece
    // wins iff total > 4*cnt(abab) — the filler words guarantee it),
    // so the EM recount must credit the whole-word piece
    val docs = (
      Seq.fill(6)("abab zq") ++ Seq("kwv", "mrt xe", "uo pj fh", "abab")
    ).map(Tuple1(_)).toDF("text")
    val out = graft.operators.TextAnalysis.unigramTrainOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // independent replay of the WHOLE trainer in plain Scala
    val wordsAll = docs.collect().flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val wf = wordsAll.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    def positional(l: Int): Map[String, Long] =
      wf.toSeq.flatMap { case (w, f) =>
        val p = w.take(20)
        (1 to p.length - l + 1).map(s => p.substring(s - 1, s - 1 + l) -> f)
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val chars = positional(1)
    val multi = (2 to 4).flatMap(positional).sortBy { case (p, c) => (-c, p) }.take(48)
    val vocab = chars ++ multi
    val tot = vocab.values.sum
    val p0 = vocab.map { case (k, c) => k -> c.toDouble / tot.toDouble }
    def viterbi(w: String): Seq[String] = {
      val p = w.take(20)
      // dp(j) = (score, path) with the op's exact tie-break
      val dp = Array.fill[Option[(Double, String)]](p.length + 1)(None)
      dp(0) = Some((1.0, ""))
      for (j <- 1 to p.length) {
        val cands = for {
          k <- 1 to math.min(4, j); prev <- dp(j - k).toSeq
          piece = p.substring(j - k, j) if p0.contains(piece)
        } yield (prev._1 * p0(piece),
          if (prev._2.isEmpty) piece else prev._2 + "\u0001" + piece)
        if (cands.nonEmpty)
          dp(j) = Some(cands.minBy { case (s, path) => (-s, path) })
      }
      dp(p.length).get._2.split("\u0001").toSeq
    }
    val em = wf.toSeq.flatMap { case (w, f) => viterbi(w).map(_ -> f) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val totE = em.values.sum
    assert(out.keySet == vocab.keySet)
    vocab.foreach { case (piece, cnt) =>
      val want = (cnt, em.getOrElse(piece, 0L),
        em.getOrElse(piece, 0L) * 1000000L / totE)
      assert(out(piece) == want, s"piece '$piece': ${out(piece)} != $want")
    }
    // the headline behavior: the frequent chunk survives as ONE piece
    assert(out("abab")._2 >= wf("abab"), s"'abab' em row ${out("abab")}")
  }

  test("unigram apply: fertility >= 1 and corpus piece mass equals the train table's EM mass") {
    val apply = Registry.queries("tokenizer_unigram_apply")(spark, sf).collect()
    assert(apply.nonEmpty)
    apply.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"fertility < 1: $r")
      assert(r.getDouble(3) >= 1.0)
    }
    // conservation: sum over docs of piece counts == sum over the
    // train vocabulary of em_count (both count every corpus word's
    // segmentation once per occurrence — one build, two rollups)
    val train = Registry.queries("tokenizer_unigram_train")(spark, sf).collect()
    assert(apply.map(_.getLong(2)).sum == train.map(_.getLong(2)).sum)
  }

  test("unigram prune: bottom-K multichar pieces go, chars stay, piece mass only grows") {
    val rows = Registry.queries("tokenizer_unigram_prune")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val pruned = rows.filter(_._2._1)
    assert(pruned.size == 8)
    assert(pruned.keys.forall(_.length >= 2), "a character was pruned")
    // the pruned set is exactly the bottom-8 multichar by (em, piece)
    val multi = rows.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, (_, emB, _, _)) => (emB, p) }
    assert(multi.take(8).map(_._1).toSet == pruned.keySet)
    // pruned pieces never appear in the re-segmentation; survivors'
    // total piece mass can only grow (coarse pieces re-split)
    assert(pruned.values.forall(_._3 == 0L))
    assert(rows.values.map(_._3).sum >= rows.values.map(_._2).sum)
    // renormalized scores are a ppm distribution over survivors
    val ppm = rows.values.map(_._4).sum
    assert(ppm > 900000L && ppm <= 1000000L, s"ppm mass $ppm")
  }

  test("batched BPE merges: pair-disjoint batches learn the same rules in fewer rounds") {
    import spark.implicits._
    val docs = Seq("aaa aaa bb bb bb", "bb bb Z$ b").toDF("text")
    // batch=1 is bit-exact classic BPE — the registry/oracle path
    val (seq1, rounds1) = operators.TextAnalysis.bpeTrainMergesRounds(docs, 6, batch = 1)
    assert(seq1.map(t => (t._1, t._2, t._3, t._4)) == Seq(
      (1, "b", "b", 5L), (2, "a", "a", 4L), (3, "aa", "a", 2L)), seq1.toString)
    // batch=4: round 1 accepts (b,b) then (a,a) — {a} disjoint from
    // {b, bb} — but NOT (aa,a) (symbol aa doesn't exist yet; and the
    // candidate pool only holds pairs of the current state anyway);
    // round 2 learns (aa,a); round 3 finds nothing. Same rules, same
    // counts, same order — 3 rounds instead of 4.
    val (seqB, roundsB) = operators.TextAnalysis.bpeTrainMergesRounds(docs, 6, batch = 4)
    assert(seqB == seq1, s"batched rules diverged: $seqB vs $seq1")
    assert(roundsB < rounds1, s"batching saved no rounds: $roundsB vs $rounds1")
    // the apply path segments identically with the batched rule table
    val docs2 = Seq((0L, "aaa aaa bb bb bb"), (1L, "bb bb Z$ b"))
      .toDF("doc_id", "text")
    val viaBatch = operators.TextAnalysis.bpeApplyWith(docs2, seqB).collect().toSeq
    val viaSeq = operators.TextAnalysis.bpeApplyWith(docs2, seq1).collect().toSeq
    assert(viaBatch.map(_.toString) == viaSeq.map(_.toString))
  }

  test("batched BPE at the default batch: bounded segmentation drift, fewer corpus rounds") {
    import org.apache.spark.sql.functions._
    // partial-merge regime on the real corpus — the regime where rule
    // ORDER matters (at vocabulary-exhausting K drift is structurally 0)
    val docs = Tables.documents(spark, sf)
    val k = 24
    val (seqR, seqRounds) = operators.TextAnalysis.bpeTrainMergesRounds(docs, k, batch = 1)
    val (batR, batRounds) = operators.TextAnalysis.bpeTrainMergesRounds(docs, k,
      batch = operators.TextAnalysis.BpeBatchDefault)
    assert(seqR.size == k && batR.size == k, "exhausted before K — lower k")
    assert(batRounds * 3 <= seqRounds,
      s"batching saved too little: $batRounds rounds vs sequential $seqRounds")
    def spw(rules: Seq[(Int, String, String, Long)]): Double =
      operators.TextAnalysis.bpeApplyWith(docs, rules)
        .agg((sum("n_bpe_tokens").cast("double") / sum("n_tokens_ws")).as("s"))
        .head.getDouble(0)
    val s0 = spw(seqR); val s1 = spw(batR)
    assert(s0 > 1.05, s"corpus fully fused at K=$k (spw=$s0) — regime lost")
    // the r13 BpeDrift measurement put batch-8 corpus drift at
    // <= 0.28% on sf0.01; 1.5% is the pinned regression bound
    assert(math.abs(s1 - s0) / s0 <= 0.015,
      f"batched drift ${math.abs(s1 - s0) / s0 * 100}%.3f%% > 1.5%% " +
        f"(seq $s0%.4f vs batch $s1%.4f)")
  }

  test("BPE apply segments every word (OOV included) with the learned merges") {
    import spark.implicits._
    val docs = Seq((0L, "aaa aaa bb bb bb"), (1L, "bb bb Z$ b"))
      .toDF("doc_id", "text")
    val m = operators.TextAnalysis.bpeApplyOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // rules (b,b), (a,a), (aa,a) fully fuse the vocabulary words;
    // "Z$" never entered training (pre-tokenizer) yet still segments —
    // to its 2 raw chars; the 1-char word "b" is a single symbol
    assert(m.toSeq == Seq(
      (0L, 5L, 5L, 1.0),   // aaa→1, bb→1: 2·1 + 3·1 over 5 words
      (1L, 4L, 5L, 1.25)), // bb→1, Z$→2, b→1: 2+2+1 over 4 words
      m.toSeq.toString)
  }

  test("curriculum order: difficulty bands partition the corpus, phases monotone") {
    val rows = Registry.queries("corpus_curriculum_order")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == rows.length, "every doc exactly once")
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq(1, 2, 3, 4),
      "test corpus should populate all four phases")
    rows.foreach { case (_, d, p, _) =>
      val want = if (d < 30) 1 else if (d < 60) 2 else if (d < 90) 3 else 4
      assert(p == want, s"difficulty $d banded to $p")
    }
    assert(rows.map(_._3).sliding(2).forall(s => s.head <= s.last),
      "output must stream phases in order")
  }

  test("datacard conserves the corpus and keeps every rate in-range") {
    val rows = Registry.queries("corpus_datacard")(spark, sf).collect()
    val total = Registry.queries("text_stats")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Int]("min_tokens") <= r.getAs[Double]("mean_tokens"))
      assert(r.getAs[Double]("mean_tokens") <= r.getAs[Int]("max_tokens"))
      for (c <- Seq("en_permil", "short_permil", "dup_permil")) {
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000, s"$c = $v out of per-mil range")
      }
    }
  }

  test("temperature mix flattens: smallest source sampled at >= the largest's rate") {
    val rows = Registry.queries("corpus_temperature_mix")(spark, sf).collect()
    assert(rows.length > 1)
    val smallest = rows.minBy(_.getAs[Long]("n_docs"))
    val largest = rows.maxBy(_.getAs[Long]("n_docs"))
    assert(smallest.getAs[Double]("achieved_rate") >= largest.getAs[Double]("achieved_rate"),
      s"small=${smallest} large=${largest}")
  }

  test("DSIR weights separate target-like docs from off-distribution docs") {
    import spark.implicits._
    // two disjoint vocabularies: the target slice writes A-words, the
    // off-distribution docs B-words; doc 3 is a RAW doc written in the
    // target's vocabulary — DSIR's whole point is that it outranks the
    // off-distribution raw docs for selection
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta alpha beta", true),
      (2L, "beta gamma delta alpha beta gamma delta alpha beta gamma", true),
      (3L, "alpha beta gamma delta epsilon alpha beta gamma", false),
      (4L, "zig zag zorro quux zig zag zorro quux zig zag", false),
      (5L, "zorro quux zig zag quux zorro zag zig zig zag", false)
    ).toDF("doc_id", "text", "is_target")
    val w = graft.operators.Curation.dsirWeightsOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // feature count = bigram occurrences = n_tokens - 1
    assert(w(1L).getAs[Long]("n_feats") == 9)
    val mean = w.view.mapValues(_.getAs[Double]("mean_imp")).toMap
    assert(mean(3L) > mean(4L) && mean(3L) > mean(5L),
      s"target-vocabulary raw doc must outscore off-distribution docs: $mean")
    // smoothing floor: a bucket never seen in the target still gets a
    // positive fixed-point weight, so scores stay strictly positive
    assert(w(4L).getAs[Long]("dsir_score") > 0)
  }

  test("quality classifier learns a genuinely separable corpus and generalizes to held-out docs") {
    import spark.implicits._
    // two disjoint vocabularies: class-1 docs write A-words, class-0
    // docs write B-words. doc_id % 4 == 3 rows (3, 7, 11, 15) are
    // HELD OUT of training — the classifier must separate them purely
    // from what it learned on the other twelve.
    val aWords = Seq("alpha beta gamma delta alpha beta gamma",
      "beta gamma delta alpha beta gamma alpha",
      "gamma delta alpha beta gamma alpha beta",
      "delta alpha beta gamma delta alpha gamma")
    val bWords = Seq("zig zag zorro quux zig zag zorro",
      "zag zorro quux zig zag zorro quux",
      "zorro quux zig zag zorro quux zig",
      "quux zig zag zorro quux zig zorro")
    val docs = ((0L to 7L).map(i =>
      (i, aWords((i % 4).toInt), true)) ++
      (8L to 15L).map(i => (i, bWords((i % 4).toInt), false)))
      .toDF("doc_id", "text", "label")
    val out = graft.operators.Curation.qualityClassifierOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.size == 16)
    // perfect separation on this corpus: every class-1 score above
    // every class-0 score, and the midpoint gate gets all 16 right —
    // INCLUDING the four held-out docs (3 and 7 positive, 11 and 15
    // negative), which is the generalization claim
    val posMin = (0L to 7L).map(out(_)._2).min
    val negMax = (8L to 15L).map(out(_)._2).max
    assert(posMin > negMax, s"class scores overlap: posMin=$posMin negMax=$negMax")
    (0L to 15L).foreach { i =>
      val (isTrain, _, pass) = out(i)
      assert(isTrain == (i % 4 != 3))
      assert(pass == (i < 8), s"doc $i gated ${out(i)}")
    }
    // the served model (weights + threshold) reproduces the batch
    // verdicts doc for doc — the contract the streaming gate rides
    val (w, tau) = graft.operators.Curation.qualityClassifierModelOf(docs)
    val applied = graft.operators.Curation
      .qualityClassifierApply(docs.select("doc_id", "text"), w, tau)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    (0L to 15L).foreach { i =>
      assert(applied(i) == ((out(i)._2, out(i)._3)), s"serve mismatch at $i")
    }
  }

  test("classifier training at production posture: sampled slice + observable convergence") {
    import spark.implicits._
    // the same separable corpus as above, but the GD rounds see only
    // the md5-sampled HALF of the train slice (the 100 TB posture,
    // where the labeled slice is sampled by construction — here that
    // keeps docs {0,1,6} of class 1 and {9,10,13} of class 0)
    val aWords = Seq("alpha beta gamma delta alpha beta gamma",
      "beta gamma delta alpha beta gamma alpha",
      "gamma delta alpha beta gamma alpha beta",
      "delta alpha beta gamma delta alpha gamma")
    val bWords = Seq("zig zag zorro quux zig zag zorro",
      "zag zorro quux zig zag zorro quux",
      "zorro quux zig zag zorro quux zig",
      "quux zig zag zorro quux zig zorro")
    val docs = ((0L to 7L).map(i =>
      (i, aWords((i % 4).toInt), true)) ++
      (8L to 15L).map(i => (i, bWords((i % 4).toInt), false)))
      .toDF("doc_id", "text", "label")
    val (w, tau, losses) = graft.operators.Curation
      .qualityClassifierModelSampledOf(docs, sampleMod = 2)
    // convergence is observable and GUARANTEED monotone: lr = 1 is
    // under the descent-lemma bound 2/L because l1-normalized
    // features keep the squared-loss Hessian's spectral radius <= 1
    assert(losses.map(_._1) == (1 to 4), s"rounds: $losses")
    losses.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b <= a, s"train loss increased: $losses")
    }
    assert(losses.last._2 < losses.head._2, s"no learning happened: $losses")
    // held-out separation unchanged: the model trained on HALF the
    // train slice still gates every doc right — including the four
    // docs no training variant ever sees (3, 7, 11, 15)
    val applied = graft.operators.Curation
      .qualityClassifierApply(docs.select("doc_id", "text"), w, tau)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val posMin = (0L to 7L).map(applied(_)._1).min
    val negMax = (8L to 15L).map(applied(_)._1).max
    assert(posMin > negMax, s"sampled model overlaps: $posMin <= $negMax")
    (0L to 15L).foreach { i =>
      assert(applied(i)._2 == (i < 8), s"doc $i gated ${applied(i)}")
    }
  }

  test("epoch plan upsamples small sources into whole repeat epochs, downsamples big ones") {
    import spark.implicits._
    // one dominant crawl + one small curated source, 10:1 in tokens:
    // sqrt-temperature must hand the small source MORE than one epoch
    // and the big one less than one
    val big = (1L to 100L).map(i => (i, "w w w w w w w w w w", "crawl"))
    val small = (101L to 110L).map(i => (i, "q q q q q q q q q q", "curated"))
    val plan = graft.operators.Curation.epochPlanOf(
      (big ++ small).toDF("doc_id", "text", "source")).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (c, k) = (plan("crawl"), plan("curated"))
    assert(c.getAs[Long]("full_epochs") == 0 && c.getAs[Long]("frac_permil") < 1000,
      s"big source must run a fractional epoch: $c")
    assert(k.getAs[Long]("full_epochs") >= 2, s"small source must repeat: $k")
    // realized copies are bounded by the plan on every source
    for (r <- plan.values) {
      val lo = r.getAs[Long]("full_epochs") * r.getAs[Long]("n_tokens")
      val hi = (r.getAs[Long]("full_epochs") + 1) * r.getAs[Long]("n_tokens")
      val got = r.getAs[Long]("planned_tokens")
      assert(got >= lo && got <= hi, s"realized tokens outside epoch band: $r")
    }
    // the budget is conserved: Σ target_tokens ≤ Σ n_tokens (div floors)
    assert(plan.values.map(_.getAs[Long]("target_tokens")).sum
      <= plan.values.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("perplexity model is order-sensitive: scrambled text craters, fluent text doesn't") {
    import spark.implicits._
    // the target corpus establishes the transition structure a b c d e
    // (cyclic); doc 3 is raw text IN that structure, doc 4 the same
    // vocabulary REVERSED — every one of its transitions is unseen, the
    // signature of scrambled/machine-mangled text a perplexity filter
    // exists to catch
    val docs = Seq(
      (1L, "a b c d e a b c d e a b c d e", true),
      (2L, "c d e a b c d e a b c d e a b", true),
      (3L, "a b c d e a b c d e", false),
      (4L, "e d c b a e d c b a", false)
    ).toDF("doc_id", "text", "is_target")
    val p = graft.operators.Curation.perplexityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(3L).getAs[Long]("n_bigrams") == 9)
    assert(p(3L).getAs[Double]("oov_frac") == 0.0,
      s"in-structure doc has no unseen transitions: ${p(3L)}")
    assert(p(4L).getAs[Double]("oov_frac") >= 0.8,
      s"reversed doc's transitions are unseen: ${p(4L)}")
    assert(p(3L).getAs[Double]("mean_fluency") > 3 * p(4L).getAs[Double]("mean_fluency"),
      s"fluency must separate: fluent=${p(3L)} scrambled=${p(4L)}")
    // the smoothing floor keeps every score strictly positive
    assert(p(4L).getAs[Long]("lm_score") > 0)
  }

  test("shard manifest conserves the corpus and tiles it contiguously") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val totTokens = docs.select(sum(size(split(col("text"), " "))).cast("long"))
      .collect()(0).getLong(0)
    val m = Registry.queries("corpus_shard_manifest")(spark, sf).collect()
      .sortBy(_.getLong(0))
    // conservation: every doc and every token lands in exactly one shard
    assert(m.map(_.getInt(1).toLong).sum == nDocs)
    assert(m.map(_.getLong(4)).sum == totTokens)
    val st = graft.operators.Curation.ShardTokens
    m.foreach { r =>
      // a shard's first token offset lies inside its own token window
      val (sid, so) = (r.getLong(0), r.getLong(5))
      assert(so >= sid * st && so < (sid + 1) * st, s"shard $sid offset $so")
    }
    // doc ranges tile: assignment is monotone in doc_id, so consecutive
    // shards meet exactly at a doc boundary (resumable-loader contract)
    m.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getLong(3) + 1 == b.getLong(2),
          s"gap between shards ${a.getLong(0)} and ${b.getLong(0)}")
        assert(a.getLong(6) == b.getLong(5), "offset spans must abut")
      case _ =>
    }
  }

  test("q23 KMV estimate is exact below capacity and within bound above it") {
    // sf0.001: ~200 distinct per symbol < k=256 ⇒ the sketch is the
    // exact distinct-hash set
    for (r <- Registry.queries("q23_kmv_distinct")(spark, sf).collect()) {
      assert(r.getAs[Int]("sketch_size") <= 256)
      if (r.getAs[Int]("sketch_size") < 256)
        // est counts distinct HASHES; 32-bit collisions are ≲1 here
        assert(math.abs(r.getAs[Double]("ndv_est") - r.getAs[Long]("ndv_exact")) <= 2)
    }
    // sf0.01: ~2000 distinct per symbol ⇒ estimating regime; KMV rel
    // error ~1/sqrt(k-1) ≈ 6%, assert a 4-sigma-ish 25%
    val est = Registry.queries("q23_kmv_distinct")(spark, "/root/testdata/sf0.01").collect()
    assert(est.exists(_.getAs[Int]("sketch_size") == 256), "expected estimating regime")
    for (r <- est if r.getAs[Int]("sketch_size") == 256) {
      val e = r.getAs[Double]("ndv_est"); val x = r.getAs[Long]("ndv_exact").toDouble
      assert(math.abs(e - x) / x <= 0.25, s"${r.getAs[String]("symbol")}: est $e vs exact $x")
    }
  }

  test("q19 funnel stages are monotonically non-increasing") {
    val rows = Registry.queries("q19_funnel")(spark, sf).collect()
    assert(rows.length == 3)
    val users = rows.sortBy(_.getAs[Int]("stage_ord")).map(_.getAs[Long]("users"))
    assert(users.sliding(2).forall(w => w(1) <= w(0)),
      s"funnel widened: ${users.mkString(" -> ")}")
  }

  test("collocations: lift replays from independent unigram/bigram counts") {
    val rows = Registry.queries("text_collocations")(spark, sf).collect()
    assert(rows.length == 50)
    val tokss = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tokss.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val u = tokss.map(_.size.toLong).sum.toDouble
    val m = (tokss.map(_.size.toLong).sum - tokss.length).toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val s = r.getString(0); val i = s.indexOf(' ')
      val (x, y) = (s.substring(0, i), s.substring(i + 1))
      val cxy = bi((x, y))
      assert(cxy == r.getLong(1) && cxy >= 5)
      val lift = ((cxy.toDouble * u) / (uni(x).toDouble * uni(y).toDouble)) * (u / m)
      assert(r6(lift) == r.getDouble(2), s"bigram '$s'")
    }
    val key = rows.map(r => (-r.getDouble(2), r.getString(0))).toSeq
    assert(key == key.sorted, "rows should rank by lift desc, bigram asc")
  }

  test("q20 retention: day-0 retention is 1.0 and actives never exceed cohort") {
    val rows = Registry.queries("q20_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_users"))
      if (r.getAs[Int]("day_offset") == 0)
        assert(r.getAs[Double]("retention") == 1.0)
    }
  }

  test("doremi mix upweights the underserved domain; integer EG law replays exactly") {
    import spark.implicits._
    // skewed mixture: 'big' dominates the token mass, 'odd' writes a
    // disjoint vocabulary — the global unigram model ranks odd's
    // tokens below the corpus mean, so odd is the Group-DRO underfit
    // domain and must gain weight every round
    val docs = (
      (0 until 20).map(i => (i.toLong, "big",
        (0 until 50).map(j => s"c${(i * 7 + j) % 30}").mkString(" "))) ++
      (20 until 24).map(i => (i.toLong, "odd",
        (0 until 50).map(j => s"z${(i * 11 + j) % 40}").mkString(" ")))
    ).toDF("doc_id", "source", "text")
    val rows = graft.operators.Curation.doremiMixOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size == 12) // 2 domains x rounds 0..5
    // round 0 is uniform
    assert(rows((0, "big"))._2 == 500000000L && rows((0, "odd"))._2 == 500000000L)
    val lamOdd = rows((0, "odd"))._1
    assert(lamOdd > 0L, s"odd excess $lamOdd should be positive")
    assert(rows((0, "big"))._1 == 0L, "the dominant domain sits above the mean")
    // odd strictly gains weight each round; big strictly loses
    (1 to 5).foreach { r =>
      assert(rows((r, "odd"))._2 > rows((r - 1, "odd"))._2, s"round $r odd")
      assert(rows((r, "big"))._2 < rows((r - 1, "big"))._2, s"round $r big")
    }
    // the exact integer EG/MW law, replayed independently in Scala
    var w = Map("big" -> 500000000L, "odd" -> 500000000L)
    val lam = Map("big" -> rows((0, "big"))._1, "odd" -> lamOdd)
    (1 to 5).foreach { r =>
      val raw = w.map { case (s, v) => s -> v * (1000000L + 1000L * lam(s)) }
      val tot = raw.values.sum
      val wn = raw.map { case (s, v) => s -> v / (tot / 1000000000L) }
      w = wn.map { case (s, v) =>
        s -> ((1000000000L - 100000000L) * v / 1000000000L + 100000000L / 2) }
      w.foreach { case (s, v) =>
        assert(rows((r, s))._2 == v, s"round $r $s: ${rows((r, s))._2} != $v") }
    }
  }

  test("doremi token-mass arithmetic survives counts past the int64 wrap point") {
    import spark.implicits._
    // 100 TB regime, compressed into the sufficient statistics: feed
    // doremiFromCounts counts of ~5e12 per bucket so sum(c·fpg)
    // crosses 9.2e18 — an int64 accumulation would wrap negative (and
    // diverge from DuckDB's native HUGEINT sums); the DECIMAL(38,0)
    // path must keep every weight a sane ppb distribution.
    val big = 5000000000000L // 5e12 tokens per (source, bucket)
    val cd = Seq(
      ("a", 0L, big), ("a", 1L, big),
      ("b", 0L, big), ("b", 2L, 1000L)
    ).toDF("source", "b", "c")
    val rows = graft.operators.Curation.doremiFromCounts(cd).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size == 12)
    rows.foreach { case (k, (excess, ppb)) =>
      assert(excess >= 0L && excess <= 1000000L, s"$k excess $excess")
      assert(ppb > 0L && ppb <= 1000000000L, s"$k weight $ppb wrapped")
    }
    // per-round ppb mass stays a distribution (renormalized + ε-mix;
    // floor-division renorm can overshoot 1e9 by a few ppb — the pin
    // is NO WRAP, so the bound is ±K·rounding, not exactness)
    (0 to 5).foreach { r =>
      val mass = Seq("a", "b").map(s => rows((r, s))._2).sum
      assert(mass > 900000000L && mass <= 1000001000L, s"round $r mass $mass")
    }
  }

  test("unigram apply under a frozen piece table counts unseen-vocab words via the char fallback") {
    import spark.implicits._
    // frozen pieces cover only {a, b, ab}: "cc" has no Viterbi path —
    // the LEFT join + char-per-piece fallback must keep it in BOTH
    // token counts (an inner join silently dropped it, skewing
    // pieces_per_word — the r15 ADVICE hole)
    val docs = Seq((1L, "ab cc"), (2L, "ab ab")).toDF("doc_id", "text")
    val pieces = Seq(("a", 0.3), ("ab", 0.4), ("b", 0.3))
    val out = operators.TextAnalysis
      .unigramApplyWith(docs, pieces, graft.functions.memoize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: 2 ws tokens; "ab" = 1 piece, "cc" = 2 chars fallback
    // doc 2: 2 ws tokens; 2 x "ab" = 2 pieces
    assert(out == Seq((1L, 2L, 3L), (2L, 2L, 2L)), out.toString)
  }
}
