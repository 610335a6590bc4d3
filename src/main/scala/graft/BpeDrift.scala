package graft

import org.apache.spark.sql.functions._

/** Batched-BPE segmentation-drift measurement (round-13 verdict item):
  * the pair-disjoint batched trainer buys ~batch× fewer corpus-wide
  * count rounds but its rule SEQUENCE diverges from classic sequential
  * BPE (counts stay honest, order doesn't — see
  * [[operators.TextAnalysis.bpeTrainMergesRounds]]). Rule agreement
  * was reported in PROBE_r12 (47/89 at batch 16, K=256) but the
  * DOWNSTREAM effect — how differently the corpus actually segments
  * under the batched rules — was not. This main measures it: for
  * batch ∈ {4, 8, 16} at the same K, train both rule tables on the
  * real corpus, apply both, and report corpus-level syms/word, the
  * relative corpus delta, and per-doc |Δ syms_per_word| stats.
  * Output rows go into PROBE_r13.txt; the chosen default batch and
  * its drift bound are pinned in QueriesSpec.
  *
  * Usage: sbt "runMain graft.BpeDrift [sfDir] [K]"   (default sf0.01, K=256)
  */
object BpeDrift {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 256
    val docs = Tables.documents(spark, dir)

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((seqRules, seqRounds), seqSecs) =
      t(operators.TextAnalysis.bpeTrainMergesRounds(docs, k, batch = 1))
    val base = operators.TextAnalysis.bpeApplyWith(docs, seqRules)
      .select(col("doc_id"), col("syms_per_word").as("spw_seq"),
        col("n_bpe_tokens").as("bpe_seq"), col("n_tokens_ws"))
      .localCheckpoint()
    val spwSeq = base.agg(
      (sum("bpe_seq").cast("double") / sum("n_tokens_ws")).as("s")).head.getDouble(0)
    println(f"bpe_drift@K$k%d seq:     rounds=$seqRounds%3d rules=${seqRules.size}%3d " +
      f"train=$seqSecs%6.1f s corpus_spw=$spwSeq%.6f")

    for (b <- Seq(4, 8, 16)) {
      val ((bRules, bRounds), bSecs) =
        t(operators.TextAnalysis.bpeTrainMergesRounds(docs, k, batch = b))
      val agree = bRules.map(r => (r._2, r._3)).toSet
        .intersect(seqRules.map(r => (r._2, r._3)).toSet).size
      val bApply = operators.TextAnalysis.bpeApplyWith(docs, bRules)
        .select(col("doc_id"), col("syms_per_word").as("spw_b"),
          col("n_bpe_tokens").as("bpe_b"))
      val r = base.join(bApply, "doc_id").agg(
        (sum("bpe_b").cast("double") / sum("n_tokens_ws")).as("spw"),
        avg(abs(col("spw_b") - col("spw_seq"))).as("mean_abs"),
        max(abs(col("spw_b") - col("spw_seq"))).as("max_abs")).head
      val rel = (r.getDouble(0) - spwSeq) / spwSeq * 100
      println(f"bpe_drift@K$k%d batch$b%-2d: rounds=$bRounds%3d rules=${bRules.size}%3d " +
        f"train=$bSecs%6.1f s corpus_spw=${r.getDouble(0)}%.6f rel=$rel%+.3f%% " +
        f"agree=$agree/${seqRules.size} doc_mean|d|=${r.getDouble(1)}%.6f " +
        f"doc_max|d|=${r.getDouble(2)}%.6f")
    }
    spark.stop()
  }
}
