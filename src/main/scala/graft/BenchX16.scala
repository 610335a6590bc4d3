package graft

/** The ×16 bench gate: the 2× bar enforced at a scale where plan
  * defects actually SHOW. The per-round sf0.1 bench catches constant
  * factors; a plan that saturates (a fixed-capacity blocking key, a
  * bucket self-join under skew, a sort that stops fitting) looks fine
  * at sf0.1 and only bends past ~10× — so this gate times the top-20
  * most expensive registry ops on the ×16 replica lake (the ScaleProbe
  * layout: replica-DISTINCT corpus, wide files) with the EXACT bench
  * methodology (min-of-two, uniform noop sink, buildState warm pass)
  * and compares against a committed quiet reference
  * (BENCH_X16_REF.json — written only by a deliberate quiet
  * re-measure, same contract as BENCH_REF.json).
  *
  * The top-20 list is FIXED (ranked by the round-15 quiet sf0.1 cost)
  * so the reference stays comparable round over round; re-rank only
  * when re-referencing. Mirrors ScaleProbe's documented exclusions:
  * ann_knn_multiprobe (the deliberate UNCAPPED baseline — a standing
  * multi-minute row re-proving a known saturation) and the Bench-only
  * etl_pipeline (needs a staged ×16 CSV lake; its ETL legs are covered
  * by the etl_normalize_* rows).
  */
object BenchX16 {

  private val Top20 = Seq(
    "ann_recall_report", "mm_phash_neardup", "embedding_matryoshka",
    "ann_knn_graph", "corpus_quality_classifier", "mm_resize",
    "embedding_pca", "ann_graph_search", "q22_bollinger",
    "tokenizer_bpe_apply", "ann_knn_hotprobe", "etl_normalize_aggtrades",
    "corpus_coreset_kcenter", "ann_knn_hotsplit", "dedup_simhash",
    "r16_nation_flow", "etl_normalize_klines", "r18_problem_suppliers",
    "r7_rollup", "corpus_filter_pipeline",
    // round-15 late additions that rank inside the top-20 by quiet
    // sf0.1 cost (mmr ~3.1 s would be #5, allpairs ~1.6 s ~#15)
    "retrieval_mmr_rerank", "dedup_allpairs",
    // round-17 additions, same rule (~1.6-1.7 s at sf0.1, ~#15); no
    // BENCH_X16_REF rows yet -> stable -1 ref_ratio until re-reference
    "dedup_gate_substring", "text_decontaminate_rewrite")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val dst = ScaleProbe.ensureReplica(spark, "/root/testdata/sf0.1", 16)
    // JVM/codegen warmup + the same ANALYZE warm pass as Bench
    spark.range(1000000L).selectExpr("sum(id * 2)", "count(distinct id % 7)").collect()
    graft.operators.RelationalQueries.warmStats(spark, dst)
    graft.etl.TableStats.rowCount(spark, s"$dst#documents")(
      Tables.documents(spark, dst).count())
    graft.etl.TableStats.rowCount(spark, s"$dst#embeddings")(
      Tables.embeddings(spark, dst).count())
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { Registry.queries(name)(spark, dst).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // index/signature builds are maintenance jobs — warm them like
    // ScaleProbe so the gate times the SERVE path's scaling (cold
    // build cost is the probe's @build exhibits' job)
    Top20.filter(Registry.buildStateOps).foreach(timed)
    val refMap: Map[String, Double] = {
      val f = new java.io.File("BENCH_X16_REF.json")
      if (!f.exists()) Map.empty
      else try {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        val txt = try src.mkString finally src.close()
        val qs = txt.substring(txt.indexOf("\"queries\":"))
        // \s* : tolerate pretty-printed refs (see Bench.refMap)
        """"([A-Za-z0-9_@]+)":\s*(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(qs)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    }
    // min-of-two, plus Bench's outlier protocol: a row past 2x its
    // quiet reference gets ONE more run in the same process (x16 rows
    // swing harder than sf0.1 ones — mm_resize measured 10-32 s across
    // otherwise-quiet runs); if even the best of three stays past 2x
    // it is listed in "contended" — a self-documenting marker instead
    // of a phantom regression.
    // same sub-floor close as Bench (r16 verdict task 4): any >2x row
    // whose reference is at least a quarter second re-measures
    // regardless of absolute delta
    def inflated(n: String, t: Double): Boolean =
      t > 0 && refMap.get(n).exists(r =>
        r > 0 && t > 2 * r && (t - r > 0.5 || r >= 0.25))
    val results0 = Top20.map(n => n -> math.min(timed(n), timed(n)))
      .map { case (n, t) => if (inflated(n, t)) n -> math.min(t, timed(n)) else n -> t }
    // tokenizer_unigram_train@cold: the COLD build path (vocab joins ×
    // 20 DP rounds) is the saturation-prone leg the warm-serve row
    // can't see — invalidate the build caches before EACH rep so
    // min-of-two stays a cold measurement (r15 verdict task 6).
    val coldName = "tokenizer_unigram_train@cold"
    def coldRep(): Double = {
      graft.operators.TextAnalysis.invalidateUnigram(dst)
      timed("tokenizer_unigram_train")
    }
    val coldT = { val t = math.min(coldRep(), coldRep())
      if (inflated(coldName, t)) math.min(t, coldRep()) else t }
    val results = results0 :+ (coldName -> coldT)
    val contended = results.collect { case (n, t) if inflated(n, t) => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    // same floor/ratio conventions as Bench: -1 marks a sub-floor row
    // (noise, not comparable) without letting the key set churn
    val ratios = results.collect {
      case (n, t) if t > 0 && refMap.get(n).exists(_ > 0) =>
        n -> (if (math.max(t, refMap(n)) >= 0.5)
          math.rint(t / refMap(n) * 100) / 100 else -1.0)
    }
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    val line =
      s"""{"metric":"total_x16","value":$total,"unit":"sec","n":2,"sink":"noop","cpus":$cpus,"contended":$contended,"ref_ratio":${jmap(ratios)},"queries":${jmap(results)},"sf":"x16 of sf0.1"}"""
    spark.stop()
    print(s"\n$line\n")
    System.out.flush()
  }
}
