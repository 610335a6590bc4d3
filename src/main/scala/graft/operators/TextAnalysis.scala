package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Op, Tables}
import graft.functions._

/** Text-quality operators for a training-data pipeline, over
  * `documents`. All are narrow per-row transforms (no shuffle except
  * final ordering) built from codegen'd `functions._` — at 100 TB these
  * run at scan speed and pipeline into any downstream filter.
  */
object TextAnalysis {

  private def toks: Column = split(col("text"), " ")

  // --- text_stats: length / tokens / punctuation / stopwords / quality --

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def textStats(s: SparkSession, dir: String): DataFrame = {
    val nTokens = size(toks)
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val stops = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    Tables.documents(s, dir)
      .select(
        col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("n_chars"),
        nTokens.as("n_tokens"),
        punct.as("n_punct"),
        stops.as("n_stopwords"))
      .withColumn("punct_ratio",
        round6(col("n_punct").cast(DoubleType) / col("n_chars").cast(DoubleType)))
      .withColumn("stopword_ratio",
        round6(col("n_stopwords").cast(DoubleType) / col("n_tokens").cast(DoubleType)))
      // heuristic quality score: long enough, low punct noise, has glue words
      .withColumn("quality_score",
        round6(least(col("n_tokens").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_punct").cast(DoubleType) / col("n_chars").cast(DoubleType)) * 0.3
          + least(col("n_stopwords").cast(DoubleType) / col("n_tokens").cast(DoubleType) * 5.0, lit(1.0)) * 0.2))
      .orderBy("doc_id")
  }

  private val textStatsSql =
    s"""WITH base AS (
      |  SELECT doc_id, lang, source,
      |         length(text) AS n_chars,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
      |         len(list_filter(string_split(text, ' '),
      |             t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
      |  FROM documents)
      |SELECT doc_id, lang, source,
      |       CAST(n_chars AS INTEGER) AS n_chars,
      |       CAST(n_tokens AS INTEGER) AS n_tokens,
      |       CAST(n_punct AS INTEGER) AS n_punct,
      |       CAST(n_stopwords AS INTEGER) AS n_stopwords,
      |       ${round6Sql("CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)")} AS punct_ratio,
      |       ${round6Sql("CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS stopword_ratio,
      |       ${round6Sql("""least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
      |         + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) * 0.3
      |         + least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.2""")} AS quality_score
      |FROM base ORDER BY doc_id""".stripMargin

  // --- text_langid: marker-word scoring, deterministic argmax ----------

  private val markers = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit"))

  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    val scored = markers.foldLeft(Tables.documents(s, dir)) {
      case (df, (l, ws)) =>
        df.withColumn(s"s_$l",
          size(filter(toks, t => t.isin(ws.map(lit): _*))))
    }.select(col("doc_id") +: col("lang") +: markers.map { case (l, _) => col(s"s_$l") }: _*)
    scored.withColumn("predicted_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .orderBy("doc_id")
  }

  private val textLangidSql = {
    def sc(l: String, ws: Seq[String]) =
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${ws.map(w => s"'$w'").mkString(",")}))) AS INTEGER) AS s_$l"
    s"""SELECT doc_id, lang,
       |       ${markers.map { case (l, ws) => sc(l, ws) }.mkString(",\n       ")},
       |       CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
       |            WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS predicted_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --- text_token_count: BPE-ish regex tokenizer ------------------------

  private val tokPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private def textTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(toks).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(tokPattern), lit(0))).as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .withColumn("chars_per_token",
        round6(col("n_chars").cast(DoubleType) / col("bpe_tokens").cast(DoubleType)))
      .orderBy("doc_id")

  private val textTokenCountSql =
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       |       CAST(len(regexp_extract_all(text, '$tokPattern')) AS INTEGER) AS bpe_tokens,
       |       CAST(length(text) AS INTEGER) AS n_chars,
       |       ${round6Sql(s"CAST(length(text) AS DOUBLE) / CAST(len(regexp_extract_all(text, '$tokPattern')) AS DOUBLE)")} AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- text_fingerprint: bag fingerprint + rolling polynomial hash -----
  // Word ints come from md5 prefixes (portable across engines); the
  // sequence hash is an order-sensitive polynomial mod 2^31-1.

  private val P = 2147483647L
  private val B = 1000003L

  private def wordInt(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast(LongType)

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(toks)), " ")).as("bag_fp"),
        aggregate(toks, lit(0L),
          (acc, w) => pmod(acc * B + wordInt(w), lit(P))).as("seq_fp"),
        size(toks).as("n_tokens"))
      .orderBy("doc_id")

  private val textFingerprintSql =
    s"""SELECT doc_id,
       |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp,
       |       list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(text, ' '),
       |             w -> CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT))),
       |         (acc, x) -> (acc * $B + x) % $P) AS seq_fp,
       |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- text_ngram_freq: corpus-wide bigram frequencies (top 50) --------
  // Explode-count-topN: the shuffle carries (bigram, partial count)
  // pairs after map-side combine — corpus-scale safe.

  private def textNgramFreq(s: SparkSession, dir: String): DataFrame = {
    graft.plans.NgramArray.register(s)
    Tables.documents(s, dir)
      .select(explode(
        graft.plans.NgramArray.ngrams(split(col("text"), " "), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
  }

  private val textNgramFreqSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |bi AS (
      |  SELECT ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i AS INTEGER)+1] AS bigram
      |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks))
      |SELECT bigram, COUNT(*) AS n FROM bi
      |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""".stripMargin

  // --- text_collocations: PMI-ranked bigram collocations ---------------
  // The phrase-mining primitive of corpus analysis (Church & Hanks'
  // pointwise mutual information): which adjacent word pairs co-occur
  // far beyond what their unigram frequencies predict — the signal
  // that seeds phrase vocabularies and multi-word tokenizer entries.
  // Engine-portable by the same convention as BM25's idf (§4): PMI's
  // log is monotone, so the op ranks and reports the log-free LIFT
  // ratio p(xy)/(p(x)·p(y)) = c_xy·U²/(M·c_x·c_y), with unigram
  // probabilities c/U over U total tokens and bigram probability
  // c_xy/M over the M = U − n_docs adjacent pairs — pure IEEE ×,/ on
  // integer-valued doubles in a pinned evaluation order, bit-identical
  // in DuckDB. Scale: both count aggregates are map-side combinable;
  // the unigram side is the vocabulary-bounded broadcast (the
  // rarity/heavy-hitters argument); corpus totals are ONE broadcast
  // row; the support floor (c_xy ≥ 5) bounds the ranked set and the
  // top-50 is the heap-rewrite shape — nothing scales with corpus
  // size except the two counting scans.

  private val CollocMinCount = 5L

  private def textCollocations(s: SparkSession, dir: String): DataFrame = {
    graft.plans.NgramArray.register(s)
    val d = Tables.documents(s, dir)
    // consumed twice (cx and cy legs) and AQE does not collapse
    // identical derivation branches (§5): materialize the vocab-scale
    // unigram counts so the corpus-wide word aggregation runs once
    val uni = d.select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_w"))
      .transform(graft.functions.memoize)
    val totals = d.agg(sum(size(toks)).as("u"), count(lit(1)).as("nd"))
      .select(col("u"), (col("u") - col("nd")).as("m"))
    val bi = d
      .select(explode(graft.plans.NgramArray.ngrams(toks, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= CollocMinCount)
      .withColumn("x", substring_index(col("bigram"), " ", 1))
      .withColumn("y", substring_index(col("bigram"), " ", -1))
    val cx = uni.select(col("word").as("x"), col("c_w").as("c_x"))
    val cy = uni.select(col("word").as("y"), col("c_w").as("c_y"))
    bi.join(broadcast(cx), "x").join(broadcast(cy), "y")
      .crossJoin(broadcast(totals))
      .withColumn("lift_raw",
        (col("c_xy").cast(DoubleType) * col("u").cast(DoubleType) /
          (col("c_x").cast(DoubleType) * col("c_y").cast(DoubleType))) *
          (col("u").cast(DoubleType) / col("m").cast(DoubleType)))
      .select(col("bigram"), col("c_xy").as("n_pair"),
        round6(col("lift_raw")).as("lift6"))
      .orderBy(col("lift6").desc, col("bigram"))
      .limit(50)
  }

  private val textCollocationsSql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |uni AS (SELECT w AS word, COUNT(*) AS c_w
       |        FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(len(ts)) AS BIGINT) AS u,
       |               CAST(SUM(len(ts)) - COUNT(*) AS BIGINT) AS m FROM toks),
       |bi AS (
       |  SELECT ts[CAST(i AS INTEGER)] AS x, ts[CAST(i AS INTEGER)+1] AS y,
       |         ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i AS INTEGER)+1] AS bigram
       |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks)),
       |bc AS (SELECT bigram, min(x) AS x, min(y) AS y, COUNT(*) AS c_xy
       |       FROM bi GROUP BY 1 HAVING COUNT(*) >= $CollocMinCount),
       |scored AS (
       |  SELECT bigram, c_xy,
       |         ((CAST(c_xy AS DOUBLE) * CAST(u AS DOUBLE)) /
       |            (CAST(ux.c_w AS DOUBLE) * CAST(uy.c_w AS DOUBLE))) *
       |           (CAST(u AS DOUBLE) / CAST(m AS DOUBLE)) AS lift_raw
       |  FROM bc JOIN uni ux ON bc.x = ux.word
       |          JOIN uni uy ON bc.y = uy.word, tot)
       |SELECT bigram, c_xy AS n_pair, ${round6Sql("lift_raw")} AS lift6
       |FROM scored
       |ORDER BY lift6 DESC, bigram LIMIT 50""".stripMargin

  // --- text_sample_per_source: deterministic stratified sampling ------
  // Bottom-k-by-hash per stratum: consistent (re-runs pick the same
  // docs), distributed (one window per stratum), and join-free — the
  // standard way to subsample a 100 TB corpus reproducibly. Hash is
  // md5 (engine-portable), tiebroken by doc_id.

  private def textSample(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 3)
      .select(col("source"), col("sample_rank"), col("doc_id"), col("lang"))
      .orderBy("source", "sample_rank")
  }

  private val textSampleSql =
    """SELECT source, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id, lang
      |FROM (
      |  SELECT source, doc_id, lang,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5(text), doc_id) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= 3
      |ORDER BY source, sample_rank""".stripMargin

  // --- text_heavy_hitters: bounded-memory word frequencies -------------
  // Uses the custom SpaceSaving TypedImperativeAggregate
  // (plans.HeavyHitters): at most `capacity` counters per partial
  // buffer regardless of corpus size — the scale path for frequency
  // stats over 100 TB of text. Capacity far exceeds this corpus's
  // vocabulary, so counts are exact and the plain GROUP BY oracle
  // applies.

  private def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.plans.HeavyHitters.register(s)
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(graft.plans.HeavyHitters.heavy_hitters(col("word"), 1024).as("hh"))
      .select(explode(col("hh")).as(Seq("word", "n")))
      .orderBy(col("n").desc, col("word"))
  }

  private val textHeavyHittersSql =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY 1 ORDER BY n DESC, word""".stripMargin

  // --- text_bm25_topk: BM25-style relevance ranking --------------------
  // The retrieval primitive a corpus pipeline uses for targeted
  // sampling ("give me the docs most about X"): BM25 scoring of every
  // document against a fixed term set, global top-50. Engine-portable
  // by construction: the idf is the log-free probabilistic form
  // (N - df + 0.5)/(df + 0.5) — ln() is not correctly-rounded-identical
  // across engines (§4), and within a term the log is monotone, so the
  // rational form preserves per-term ordering while staying
  // bit-identical; every remaining op is IEEE +,×,/ evaluated in the
  // same order on both sides. All corpus-derived numbers come from the
  // MAINTAINED inverted index ([[CorpusIndex]] — the same build state
  // retrieval_rrf's sparse side serves from, so the two BM25 surfaces
  // share one definition): per-doc term frequencies are posting-list
  // lookups for the 3 query terms (at scale: 3 partition-pruned
  // posting reads, never a corpus re-tokenize), dl is the index's
  // length column, and (N, avgdl, per-term df) are ONE broadcast row.

  private[graft] val Bm25Terms = Seq("customer", "query", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  private def textBm25(s: SparkSession, dir: String): DataFrame =
    bm25Over(CorpusIndex.postings(s, dir), CorpusIndex.docLengths(s, dir),
      CorpusIndex.docFreq(s, dir), CorpusIndex.stats(s, dir))

  /** BM25 top-50 over EXPLICIT inverted-index frames — the registry op
    * feeds the memoized [[CorpusIndex]] build; the maintained index
    * lake's serve ([[graft.streaming.StreamingJobs.bm25IndexSearch]])
    * feeds the lake tables. One scoring definition for both surfaces
    * (StreamingSpec pins their equality over the union corpus). */
  private[graft] def bm25Over(postings: DataFrame, docLengths: DataFrame,
      docFreq: DataFrame, corpusStats: DataFrame): DataFrame = {
    // term lookups: only the 3 query terms' posting lists leave the
    // index; docs missing a term get tf 0 via the left join + coalesce
    val tfAggs = Bm25Terms.map(t =>
      sum(when(col("word") === t, col("tf")).otherwise(0L)).as(s"tf0_$t"))
    val termTf = postings
      .filter(col("word").isin(Bm25Terms: _*))
      .groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    val tf = docLengths
      .join(termTf, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("dl").cast(IntegerType).as("dl") +:
        Bm25Terms.map(t =>
          coalesce(col(s"tf0_$t"), lit(0L)).cast(IntegerType).as(s"tf_$t")): _*)
    // per-term df from the vocabulary-sized df table; coalesce covers
    // a term absent from the corpus (empty filter → null sum)
    val dfAggs = Bm25Terms.map(t =>
      coalesce(sum(when(col("word") === t, col("df")).otherwise(0L)), lit(0L))
        .as(s"df_$t"))
    val dfRow = docFreq
      .filter(col("word").isin(Bm25Terms: _*))
      .agg(dfAggs.head, dfAggs.tail: _*)
    val stats = corpusStats.crossJoin(dfRow)
    val score = Bm25Terms.map { t =>
      val idf = (col("n_docs").cast(DoubleType) - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * (col(s"tf_$t") * lit(Bm25K1 + 1.0)) /
        (col(s"tf_$t") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    // two-phase global top-k: orderBy+limit plans as
    // TakeOrderedAndProject (per-partition partial top-50, no
    // corpus-sized single-partition sort); the rank window then runs
    // over the 50 survivors only — bounded, like token_pack's
    // shard-totals window (PlanSpec pins the TakeOrdered shape)
    val top = tf.crossJoin(broadcast(stats))
      .withColumn("bm25", round6(score))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(50)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bm25").desc, col("doc_id"))
    top
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .select(Seq(col("doc_id"), col("dl")) ++
        Bm25Terms.map(t => col(s"tf_$t")) ++ Seq(col("bm25"), col("rnk")): _*)
      .orderBy("rnk")
  }

  private val textBm25Sql: String = {
    val tfCols = Bm25Terms.map(t =>
      s"CAST(len(list_filter(ts, w -> w = '$t')) AS INTEGER) AS tf_$t").mkString(",\n    ")
    val dfCols = Bm25Terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n    ")
    // CAST the non-dyadic literal to DOUBLE: DuckDB parses bare 2.2 as
    // DECIMAL and computes tf*2.2 exactly, one ulp off Spark's double
    // multiply; the dyadic constants (0.5/0.75/0.25) are exact either way
    val score = Bm25Terms.map { t =>
      s"((CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5)) * " +
        s"(tf_$t * CAST(${Bm25K1 + 1.0} AS DOUBLE)) / " +
        s"(tf_$t + CAST($Bm25K1 AS DOUBLE) * ((1.0 - $Bm25B) + $Bm25B * dl / avgdl))"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |tf AS (
       |  SELECT doc_id, CAST(len(ts) AS INTEGER) AS dl,
       |    $tfCols
       |  FROM toks),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
       |    $dfCols
       |  FROM tf),
       |scored AS (
       |  SELECT doc_id, dl, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
       |         ${round6Sql(score)} AS bm25
       |  FROM tf, stats),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rnk
       |  FROM scored)
       |SELECT doc_id, dl, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")}, bm25, rnk
       |FROM ranked WHERE rnk <= 50 ORDER BY rnk""".stripMargin
  }

  // --- tokenizer_bpe_train: distributed BPE merge learning ------------
  // The tokenizer-training step of a training-data pipeline (Sennrich
  // et al. 2016; the GPT-2/Llama byte-pair lineage): learn the first K
  // merge rules by repeatedly fusing the corpus's most frequent
  // adjacent symbol pair. Scale shape: the ONLY corpus-touching stage
  // is the word-frequency pass — a map-side-combinable groupBy plus a
  // TakeOrdered(V) vocabulary cut, exactly how production BPE trainers
  // run (they train on the word-count table, never the raw corpus);
  // the K merge rounds then iterate on a vocab-BOUNDED (≤V words ×
  // word-length) symbol table with per-round localCheckpoint (the
  // pagerank/Lloyd convention). Greedy left-to-right overlap semantics
  // (aaa + (a,a) → [aa, a]) are resolved set-wise with the islands
  // trick: adjacent matches can only chain when lhs = rhs, runs merge
  // at odd in-run ranks — deterministic, so the DuckDB oracle replays
  // every round as unrolled CTEs (the kcenter/Lloyd pattern). Pair
  // counts weight by word frequency; ties break lexicographically.

  private val BpeMerges = 6
  private val BpeVocabWords = 256

  private def bpeState0(docs: DataFrame): DataFrame =
    bpeState0Counts(wordCountsOf(docs))

  /** The BPE/WordPiece trainer seed from a prepared (w, wf) count
    * frame (the maintained tokenizer-stats lake's retrain path):
    * pre-tokenizer normalization — lowercase alphanumeric words of
    * length >= 2, the cut a real trainer applies before counting —
    * then the TakeOrdered(V) vocabulary cut and the per-char symbol
    * explode. Counting commutes with the per-word filter, so this is
    * bit-identical to counting the filtered corpus directly. */
  private[graft] def bpeState0Counts(wc: DataFrame): DataFrame = {
    val words = wc.select(col("w").as("word"), col("wf").as("wc"))
      .filter(length(col("word")) >= 2 && col("word").rlike("^[a-z0-9]+$"))
      .orderBy(col("wc").desc, col("word"))
      .limit(BpeVocabWords)
    words
      .select(col("word"), col("wc"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
      .localCheckpoint()
  }

  // keyed by applicationId like the Dedup caches — stable for the life
  // of a SparkContext and never reused after GC
  private val bpeRulesCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[(Int, String, String, Long)]]()

  /** The learned merge table, memoized per (application, lake): the
    * tokenizer artifact is BUILD state (trained once per corpus
    * snapshot, then served by every consumer — the train presentation,
    * the apply segmentation, and the streaming segmenter), exactly the
    * signatures/edges/labels convention. Flushed by the re-ANALYZE
    * invalidation hook. */
  private[graft] def bpeRules(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    bpeRulesCache.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => bpeTrainMerges(Tables.documents(s, dir)))

  private[graft] def invalidateBpe(dirPrefix: String): Unit = {
    val it = bpeRulesCache.keySet().iterator()
    while (it.hasNext) if (it.next()._2.startsWith(dirPrefix)) it.remove()
  }
  // object init runs before any cache fill, so registration can never
  // miss an entry
  graft.etl.TableStats.registerInvalidationHook(invalidateBpe)

  private def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    bpeRules(s, dir)
      .map { case (r, l, rr, c) => (r, l, rr, l + rr, c) }
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_round")
  }

  /** One greedy BPE fuse round over a (word, …, pos, sym) symbol
    * stream: merge every adjacent (lhs, rhs) occurrence left-to-right.
    * Pure window arithmetic over the word partition — no joins: a run
    * of consecutive matches (only possible when lhs = rhs) fuses at
    * odd in-run offset (run start = last non-matching position, dense
    * positions make offset ≡ in-run rank), the right neighbor of a
    * fused position is consumed, and positions re-sequence densely for
    * the next round. Join-free matters for [[bpeApplyOf]]: its state is
    * the FULL distinct-word table, where a kept-positions side would
    * not be broadcastable. */
  private def bpeFuse(state: DataFrame, lhs: Column, rhs: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("word").orderBy("pos")
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = state.columns.filterNot(Set("pos", "sym")).map(col).toSeq
    state
      .withColumn("nxt", lead("sym", 1).over(w))
      .withColumn("m",
        coalesce(col("sym") === lhs && col("nxt") === rhs, lit(false)))
      .withColumn("run0",
        coalesce(max(when(!col("m"), col("pos"))).over(wCum), lit(-1)))
      .withColumn("keep", col("m") && (col("pos") - col("run0")) % 2 === 1)
      .withColumn("consumed", coalesce(lag("keep", 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .select(carried ++ Seq(col("pos"),
        when(col("keep"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym")): _*)
      .withColumn("pos", (row_number().over(w) - 1).cast(IntegerType))
  }

  /** The learned merge rules as driver values — (rule index, lhs, rhs,
    * weighted pair count) — plus the number of DISTRIBUTED count
    * rounds it took. One bounded collect per round, the same
    * metadata-scale driver traffic as MLlib centroid iteration;
    * everything heavy stays distributed. Stops early when a round
    * finds no pair.
    *
    * `batch` > 1 learns PAIR-DISJOINT merge batches per round (the
    * standard BPE batching trick): candidates are accepted in
    * (count desc, lhs, rhs) order while their symbols are disjoint
    * from every symbol an already-accepted merge this round touches
    * or creates. Merging (l, r) only perturbs adjacency counts of
    * pairs containing l, r, or the created symbol l+r, so every
    * accepted pair's count is exactly what a sequential recount
    * would see. That makes the COUNTS honest, not the SEQUENCE: a
    * sequential trainer re-ranks after every merge, so either a
    * newly-created pair or an overlap-REJECTED pair whose count
    * survived can out-rank a later in-batch acceptance — agreement
    * with sequential is therefore measured (the @K probe reports it),
    * never assumed. The trade buys ~batch× fewer corpus-wide count
    * rounds: a 32k-merge production vocab drops from 32k sequential
    * driver round-trips to ~2k.
    * `batch = 1` is bit-exact classic BPE — the registry op's and the
    * DuckDB oracle's path. */
  private[graft] def bpeTrainMergesRounds(docs: DataFrame,
      merges: Int = BpeMerges, batch: Int = 1)
      : (Seq[(Int, String, String, Long)], Int) =
    bpeTrainMergesRoundsFrom(bpeState0(docs), merges, batch)

  /** The merge loop over a prepared seed state — shared by the docs
    * path and the count-lake retrain path. */
  private[graft] def bpeTrainMergesRoundsFrom(state0: DataFrame,
      merges: Int, batch: Int)
      : (Seq[(Int, String, String, Long)], Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("word").orderBy("pos")
    var state = state0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val want = math.min(batch, merges - out.size)
      val pool = state.withColumn("nxt", lead("sym", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
        .agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(if (want == 1) 1 else want * 8)
        .collect()
      rounds += 1
      if (pool.isEmpty) exhausted = true
      else {
        // greedy pair-disjoint acceptance; `used` also carries each
        // created symbol so a later pair can never match occurrences
        // an earlier fuse of this round just wrote (string collision:
        // an existing symbol may literally equal l+r)
        val used = scala.collection.mutable.Set.empty[String]
        var taken = 0
        val it = pool.iterator
        while (it.hasNext && taken < want) {
          val row = it.next()
          val (l, rr, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (!used(l) && !used(rr)) {
            out += ((out.size + 1, l, rr, c))
            used += l; used += rr; used += (l + rr)
            state = bpeFuse(state, lit(l), lit(rr))
            taken += 1
          }
        }
        // one materialization per ROUND, not per merge — the fuses of
        // a batch chain lazily into the same checkpointed pass
        state = state.localCheckpoint()
      }
    }
    (out.toSeq, rounds)
  }

  private[graft] def bpeTrainMerges(docs: DataFrame,
      merges: Int = BpeMerges, batch: Int = 1): Seq[(Int, String, String, Long)] =
    bpeTrainMergesRounds(docs, merges, batch)._1

  /** Scale-path trainer batch, PICKED FROM MEASUREMENT (r13 BpeDrift,
    * sf0.01, partial-merge regime K ∈ {32, 64} — the regime where rule
    * order matters; at vocabulary-exhausting K every batch converges to
    * the identical full fusion and drift is structurally 0):
    *
    *   batch  rounds(K=64)  corpus syms/word drift  doc max |Δ|
    *     4        16 (4×)        +0.001…0.062 %        0.40
    *     8         8 (8×)        +0.083…0.272 %        0.60
    *    16         6 (11×)       +0.451…2.375 %        0.90
    *
    * 8 is the knee: ~8× fewer corpus-wide count rounds (a 32k-merge
    * production vocab: 32k driver round-trips → ~4k) while corpus-level
    * segmentation stays within ~0.3 % of classic sequential BPE;
    * batch 16's drift crosses the percent mark. QueriesSpec pins the
    * drift bound at this default; `batch = 1` remains the registry op /
    * oracle path (bit-exact classic BPE). */
  private[graft] val BpeBatchDefault = 8

  /** The production-scale trainer: classic semantics approximated by
    * pair-disjoint batches at [[BpeBatchDefault]] — use for K large
    * enough that per-round corpus counts dominate (the 100 TB path);
    * the sequential trainer stays the correctness oracle. */
  private[graft] def bpeTrainMergesScale(docs: DataFrame,
      merges: Int): Seq[(Int, String, String, Long)] =
    bpeTrainMerges(docs, merges, BpeBatchDefault)

  /** The BPE trainer over any frame with a `text` column — the
    * registry op feeds `documents`; specs feed hand-computable
    * corpora. */
  private[graft] def bpeTrainOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainMerges(docs)
      .map { case (r, l, rr, c) => (r, l, rr, l + rr, c) }
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_round")
  }

  // --- tokenizer_bpe_apply: segment the corpus with learned merges ----
  // The serve half of the tokenizer: apply the K learned merge rules to
  // every document and report whitespace-token vs BPE-symbol counts
  // (the token-budget numbers a training run plans with). Scale shape:
  // identical words segment identically, so the fuse rounds run over
  // the DISTINCT-word table (vocab-scale, ≪ corpus) and results join
  // back to per-(doc, word) occurrence counts — the corpus itself is
  // touched by exactly two map-side-combinable passes (distinct words,
  // occurrence counts), never by the iteration. The fuse itself is the
  // join-free window formulation ([[bpeFuse]]) shared with training,
  // so train/apply semantics cannot drift.

  private def bpeApply(s: SparkSession, dir: String): DataFrame =
    bpeApplyWith(Tables.documents(s, dir), bpeRules(s, dir))

  /** Self-contained train+apply over one frame (specs). */
  private[graft] def bpeApplyOf(docs: DataFrame): DataFrame =
    bpeApplyWith(docs, bpeTrainMerges(docs))

  /** Segment `docs` with an ALREADY-LEARNED rule table — the serve
    * path the registry op and the streaming segmenter share.
    *
    * Each fuse round's state feeds multiple consumers inside the next
    * [[bpeFuse]], so every round MUST materialize (the AQE-non-reuse
    * lesson; un-materialized the chain re-derives exponentially like
    * the oracle's non-MATERIALIZED CTEs). `materialize` picks HOW: the
    * batch ops default to localCheckpoint (blocks reclaimed by driver
    * GC — fine for a bounded run); a long-lived caller that must not
    * accumulate per-batch blocks (the streaming segmenter) passes
    * persist and unpersists deterministically when its batch ends. */
  private[graft] def bpeApplyWith(docs: DataFrame,
      rules: Seq[(Int, String, String, Long)],
      materialize: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val seg = bpeSegmentsWith(docs, rules, materialize)
    docs.select(col("doc_id"), explode(toks).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n_occ"))
      .join(seg, "word")
      .groupBy("doc_id").agg(
        sum("n_occ").as("n_tokens_ws"),
        sum(col("n_occ") * col("n_syms")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_tokens_ws"), col("n_bpe_tokens"),
        ratio(col("n_bpe_tokens").cast(DoubleType), col("n_tokens_ws").cast(DoubleType))
          .as("syms_per_word"))
      .orderBy("doc_id")
  }

  /** The vocab-scale fuse loop shared by [[bpeApplyWith]] and the
    * streaming segmenter: distinct words → per-char symbol rows →
    * fold [[bpeFuse]] over the learned rules → one (`word`,
    * `n_syms`) row per distinct word. Runs entirely at vocabulary
    * scale (≪ corpus); callers join the result back to occurrence
    * counts. */
  private[graft] def bpeSegmentsWith(docs: DataFrame,
      rules: Seq[(Int, String, String, Long)],
      materialize: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val words = docs.select(explode(toks).as("word")).distinct()
    var state = materialize(words
      .select(col("word"), posexplode(split(col("word"), "")).as(Seq("pos", "sym"))))
    for ((_, l, rr, _) <- rules)
      state = materialize(bpeFuse(state, lit(l), lit(rr)))
    state.groupBy("word").agg(count(lit(1)).as("n_syms"))
  }

  /** The train replay's CTE chain — shared prefix of the train and
    * apply oracles. Every CTE is MATERIALIZED: each round's state
    * feeds three consumers (pair count, match set, rewrite), and
    * DuckDB's default inline-per-reference expansion makes a K-deep
    * branching chain re-evaluate the whole history exponentially
    * (measured: minutes for K=6 over 256 words; milliseconds
    * materialized). */
  private def bpeTrainCtes: String = {
    val rounds = (1 to BpeMerges).map { r =>
      s"""q$r AS MATERIALIZED (
         |  SELECT word, wc, pos, sym,
         |         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM s${r - 1}),
         |t$r AS MATERIALIZED (
         |  SELECT sym AS lhs, nxt AS rhs, CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM q$r WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |k$r AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |           row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rnk
         |    FROM (
         |      SELECT q.word, q.pos,
         |             q.pos - row_number() OVER (PARTITION BY q.word ORDER BY q.pos) AS grp
         |      FROM q$r q, t$r t WHERE q.sym = t.lhs AND q.nxt = t.rhs))
         |  WHERE rnk % 2 = 1),
         |s$r AS MATERIALIZED (
         |  SELECT word, wc,
         |         CAST(row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS INTEGER) AS pos,
         |         sym
         |  FROM (
         |    SELECT q.word, q.wc, q.pos,
         |           CASE WHEN k.pos IS NOT NULL THEN q.sym || q.nxt ELSE q.sym END AS sym
         |    FROM q$r q
         |    LEFT JOIN k$r k  ON q.word = k.word  AND q.pos = k.pos
         |    LEFT JOIN k$r kc ON q.word = kc.word AND q.pos = kc.pos + 1
         |    WHERE kc.pos IS NULL))""".stripMargin
    }.mkString(",\n")
    s"""wcnt AS MATERIALIZED (
       |  SELECT word, count(*) AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+${"$"}')
       |  GROUP BY 1 ORDER BY wc DESC, word LIMIT $BpeVocabWords),
       |s0 AS MATERIALIZED (
       |  SELECT word, wc, CAST(i - 1 AS INTEGER) AS pos,
       |         cs[CAST(i AS INTEGER)] AS sym
       |  FROM (SELECT word, wc, string_split(word, '') AS cs,
       |          unnest(generate_series(1, length(word))) AS i FROM wcnt)),
       |$rounds""".stripMargin
  }

  private def bpeTrainSql: String = {
    val out = (1 to BpeMerges).map(r =>
      s"SELECT $r AS merge_round, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count FROM t$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeTrainCtes
       |SELECT * FROM ($out)
       |ORDER BY merge_round""".stripMargin
  }

  /** Apply oracle: replays [[bpeFuse]]'s offset arithmetic (run start
    * = last non-matching position, fuse at odd offsets, right neighbor
    * consumed) over the distinct-word table, against the train chain's
    * learned rules. `LEFT JOIN t ON TRUE` mirrors the Spark side's
    * skip-empty-rule semantics: a rule-less round leaves the state
    * untouched instead of annihilating it. */
  private def bpeApplySql: String = {
    val rounds = (1 to BpeMerges).map { r =>
      s"""f$r AS MATERIALIZED (
         |  SELECT a.word, a.pos, a.sym,
         |         lead(a.sym) OVER (PARTITION BY a.word ORDER BY a.pos) AS nxt,
         |         t.lhs, t.rhs
         |  FROM a${r - 1} a LEFT JOIN t$r t ON TRUE),
         |h$r AS MATERIALIZED (
         |  SELECT word, pos, sym, nxt, m,
         |         COALESCE(MAX(CASE WHEN NOT m THEN pos END) OVER
         |           (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING), -1) AS run0
         |  FROM (SELECT word, pos, sym, nxt,
         |          COALESCE(sym = lhs AND nxt = rhs, FALSE) AS m FROM f$r)),
         |j$r AS MATERIALIZED (
         |  SELECT word, pos, sym, nxt, keep,
         |         COALESCE(lag(keep) OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed
         |  FROM (SELECT word, pos, sym, nxt,
         |          (m AND (pos - run0) % 2 = 1) AS keep FROM h$r)),
         |a$r AS MATERIALIZED (
         |  SELECT word,
         |         CAST(row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS INTEGER) AS pos,
         |         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
         |  FROM j$r WHERE NOT consumed)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |vocab AS MATERIALIZED (
       |  SELECT DISTINCT word
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)),
       |a0 AS MATERIALIZED (
       |  SELECT word, CAST(i - 1 AS INTEGER) AS pos,
       |         cs[CAST(i AS INTEGER)] AS sym
       |  FROM (SELECT word, string_split(word, '') AS cs,
       |          unnest(generate_series(1, greatest(length(word), 1))) AS i FROM vocab)),
       |$rounds,
       |seg AS (SELECT word, count(*) AS n_syms FROM a$BpeMerges GROUP BY 1),
       |occ AS (
       |  SELECT doc_id, word, count(*) AS n_occ
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1, 2)
       |SELECT o.doc_id,
       |       CAST(sum(n_occ) AS BIGINT) AS n_tokens_ws,
       |       CAST(sum(n_occ * n_syms) AS BIGINT) AS n_bpe_tokens,
       |       ${ratioSql("CAST(sum(n_occ * n_syms) AS DOUBLE)", "CAST(sum(n_occ) AS DOUBLE)")} AS syms_per_word
       |FROM occ o JOIN seg USING (word)
       |GROUP BY 1 ORDER BY o.doc_id""".stripMargin
  }

  // --- tokenizer_unigram_train: unigram-LM tokenizer (SentencePiece) ---
  // The OTHER tokenizer-training family next to BPE (Kudo 2018,
  // SentencePiece's unigram model): instead of greedy pair merges, a
  // piece VOCABULARY with probabilities, segmentation = the Viterbi
  // max-product path over each word's piece lattice, and training =
  // EM (segment under current scores, recount pieces from the chosen
  // paths). Deterministic, engine-portable instantiation: seed vocab =
  // every character of the corpus plus the top-[[UniTopV]] substrings
  // of length 2..[[UniMaxPiece]] by wf-weighted positional count
  // (cnt DESC, piece tie-break); seed scores p₀ = cnt/total as IEEE
  // doubles (identical division in both engines); Viterbi runs on the
  // [[UniMaxWord]]-char word prefix (the editdist bounded-prefix
  // convention) as [[UniMaxWord]] unrolled DP rounds — dp[j] =
  // max over k ≤ 4 of dp[j−k]·p₀(substr(j−k+1, k)) with the path
  // string itself as the deterministic tie-break (products of
  // identical doubles are bit-identical, string compare is binary in
  // both engines); then ONE EM recount (the E/M step SentencePiece
  // iterates) re-weights every piece by the wf-weighted count of its
  // appearances in the chosen segmentations. Output: the vocabulary
  // table (piece, seed_count, em_count, score_ppm) — the trained
  // artifact a tokenizer serve loads. Scale shape: word stream →
  // vocab-scale distinct-word frame (one map-side-combinable agg),
  // candidate counting is word-local explodes, the DP rounds are
  // vocab-scale broadcast joins (the piece table is ≤ chars+48 rows),
  // per-round checkpoints per the k-center/whitening convention. Full
  // DuckDB oracle: seed CTEs + 20 MATERIALIZED DP rounds + recount.

  private val UniMaxWord = 20
  private val UniMaxPiece = 4
  private val UniTopV = 48
  // path separator: out-of-band \u0001 (SQL chr(1)), NOT '|' - a
  // corpus containing '|' would otherwise make the separator a
  // legitimate vocabulary piece and silently miscount the EM recount
  // and every n_pieces split, consistently in BOTH engines (so the
  // oracle could never catch it).
  private val UniSep = "\u0001"

  /** Memoized (voc, seg) build per (application, lake) — ONE training
    * pass serves both the train table and the apply rollup (the
    * bpeRules convention). */
  private val uniCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (DataFrame, DataFrame, DataFrame)]()

  private def uniBuild(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    graft.functions.buildCached(s, uniCache, (s.sparkContext.applicationId, dir))(
      unigramBuildOf(Tables.documents(s, dir)))

  /** The trainer over any (text) frame — split out so the spec can
    * replay the whole pipeline independently on a crafted corpus. */
  private[graft] def unigramTrainOf(docs: DataFrame): DataFrame = {
    val (_, voc, seg) = unigramBuildOf(docs)
    unigramTableOf(voc, seg)
  }

  /** The corpus word-frequency table (w, wf) — THE additive sufficient
    * statistic every tokenizer trainer consumes (unigram seeds +
    * Viterbi weights; BPE/WordPiece derive their normalized top-V cut
    * from it). Additivity is what makes the maintained tokenizer-stats
    * lake ([[graft.streaming.StreamingJobs.vocabStatsAppendStream]]) a
    * pure count journal: append lands each batch's counts, serve sums,
    * and a retrain NEVER re-scans the corpus — this one
    * map-side-combinable pass is the only corpus-touching stage any
    * trainer has. */
  private[graft] def wordCountsOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wf"))

  /** (voc, seg): the scored piece table and the per-word Viterbi
    * segmentation — the build artifacts. */
  private[graft] def unigramBuildOf(docs: DataFrame): (DataFrame, DataFrame, DataFrame) =
    unigramBuildOfWords(wordCountsOf(docs))

  /** The build over a prepared (w, wf) count frame — the retrain path
    * of the maintained tokenizer-stats lake; identical arithmetic to
    * the docs path by construction (one definition). */
  private[graft] def unigramBuildOfWords(wc: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val words = wc
      .withColumn("p", substring(col("w"), 1, UniMaxWord))
      .withColumn("plen", length(col("p")))
      .transform(graft.functions.memoize)
    val posFrame = words.select(col("wf"), col("p"), col("plen"),
      explode(sequence(lit(1), col("plen"))).as("s"))
    val multi = (2 to UniMaxPiece).map { l =>
      posFrame.filter(col("s") + (l - 1) <= col("plen"))
        .select(expr(s"substr(p, s, $l)").as("piece"), col("wf"))
    }.reduce(_.union(_))
      .groupBy("piece").agg(sum("wf").as("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(UniTopV)
    val chars = posFrame
      .select(expr("substr(p, s, 1)").as("piece"), col("wf"))
      .groupBy("piece").agg(sum("wf").as("cnt"))
    val vocab0 = chars.union(multi)
    val tot0 = vocab0.agg(sum("cnt").as("t0"))
    // the piece table feeds every DP branch (≤ 4·UniMaxWord joins):
    // one materialization, broadcast everywhere
    val voc = vocab0.crossJoin(broadcast(tot0))
      .select(col("piece"), col("cnt"),
        (col("cnt").cast(DoubleType) / col("t0").cast(DoubleType)).as("p0"))
      .transform(graft.functions.memoize)
    (words, voc, uniViterbi(words, voc))
  }

  /** The unrolled Viterbi DP over a (w, wf, p, plen) word frame and a
    * broadcast (piece, p0) score table — shared by the seed
    * segmentation, the post-prune re-segmentation, and the streaming
    * segmenter (which injects a persist-based `memo` so a long-lived
    * stream doesn't accumulate checkpoint blocks — the bpeApplyWith
    * convention). Returns the terminal (w, wf, p, plen, score, path)
    * rows, memoized. */
  private def uniViterbi(words: DataFrame, voc: DataFrame,
      memo: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("score").desc, col("path"))
    var dps = Vector(memo(words.select(col("w"), col("wf"), col("p"), col("plen"),
      lit(1.0).as("score"), lit("").as("path"))))
    for (j <- 1 to UniMaxWord) {
      val branches = (1 to math.min(UniMaxPiece, j)).map { k =>
        dps(j - k).filter(col("plen") >= j)
          .join(broadcast(voc),
            col("piece") === expr(s"substr(p, ${j - k + 1}, $k)"))
          .select(col("w"), col("wf"), col("p"), col("plen"),
            (col("score") * col("p0")).as("score"),
            when(col("path") === "", col("piece"))
              .otherwise(concat(col("path"), lit(UniSep), col("piece"))).as("path"))
      }
      dps = dps :+ memo(branches.reduce(_.union(_))
        .withColumn("rn", row_number().over(wWin))
        .filter(col("rn") === 1).drop("rn"))
    }
    memo((1 to UniMaxWord).map(j => dps(j).filter(col("plen") === j))
      .reduce(_.union(_)))
  }

  /** The vocabulary table from the build artifacts (the train op's
    * output shape). */
  private def unigramTableOf(voc: DataFrame, seg: DataFrame): DataFrame = {
    val em = seg.select(col("wf"), explode(split(col("path"), UniSep)).as("piece"))
      .groupBy("piece").agg(sum("wf").as("em_count"))
    val totE = em.agg(sum("em_count").as("te"))
    voc.join(em, Seq("piece"), "left")
      .crossJoin(broadcast(totE))
      .select(col("piece"), col("cnt").as("seed_count"),
        coalesce(col("em_count"), lit(0L)).as("em_count"),
        // DECIMAL widening: em_count*1e6 wraps int64 past ~9.2e12
        // pieces while the DuckDB twin (HUGEINT) keeps going - the
        // doremi lesson applied to the tokenizer family
        expr("CAST(coalesce(em_count, 0L) AS DECIMAL(38,0)) * 1000000L div te")
          .as("score_ppm"))
      .transform(graft.functions.checkpointBeforeSort)
      .orderBy("piece")
  }

  private def unigramTrain(s: SparkSession, dir: String): DataFrame = {
    val (_, voc, seg) = uniBuild(s, dir)
    unigramTableOf(voc, seg)
  }

  // --- tokenizer_unigram_apply: segment the corpus with the artifact ---
  // The serve half (tokenizer_bpe_apply's sibling): per document, the
  // whitespace token count, the unigram piece count under the TRAINED
  // segmentation (the memoized build — one training pass serves both
  // ops), and pieces/word — the fertility number a tokenizer decision
  // reads. Same rollup shape as bpe_apply: the per-word piece counts
  // ride a vocab-scale join against the word-occurrence table; the
  // corpus text is touched once.

  private def unigramApply(s: SparkSession, dir: String): DataFrame = {
    val (_, _, seg) = uniBuild(s, dir)
    uniApplyRollup(Tables.documents(s, dir), seg)
  }

  /** Per-doc rollup of the per-word piece counts — ONE definition for
    * the batch apply op and the streaming segmenter. */
  private[graft] def uniApplyRollup(docs: DataFrame, seg: DataFrame): DataFrame = {
    val npieces = seg.select(col("w").as("word"),
      size(split(col("path"), UniSep)).as("n_pieces"))
    val occ = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n_occ"))
    // LEFT join + char-per-piece fallback: under a FROZEN piece table
    // (the streaming segmenter) a word containing a character absent
    // from the training vocabulary has no Viterbi path and is missing
    // from `seg` — an inner join would silently drop it from BOTH
    // token counts, skewing pieces_per_word (the BPE twin segments any
    // word into chars and cannot drop). Batch behavior is unchanged:
    // the train vocab covers every corpus character, so every word
    // matches and the oracle's inner join stays equivalent.
    occ.join(npieces, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(sum("n_occ").as("n_tokens_ws"),
        sum(col("n_occ") * coalesce(col("n_pieces"),
          least(length(col("word")), lit(UniMaxWord)))).as("n_uni_pieces"))
      .select(col("doc_id"), col("n_tokens_ws"), col("n_uni_pieces"),
        ratio(col("n_uni_pieces").cast(DoubleType),
          col("n_tokens_ws").cast(DoubleType)).as("pieces_per_word"))
      .orderBy("doc_id")
  }

  /** Trainer tables from a prepared (w, wf) count frame — the
    * maintained tokenizer-stats lake's retrain legs
    * ([[graft.streaming.StreamingJobs]] vocab lake). One definition
    * with the docs-path trainers (both route through the same build
    * functions), so retrain-from-journal is bit-identical to
    * train-from-corpus whenever the journal's summed counts equal the
    * corpus counts — which additivity guarantees. */
  private[graft] def unigramTrainOfWords(wc: DataFrame): DataFrame = {
    val (_, voc, seg) = unigramBuildOfWords(wc)
    unigramTableOf(voc, seg)
  }

  private[graft] def bpeTrainOfWords(wc: DataFrame): DataFrame = {
    val spark = wc.sparkSession
    import spark.implicits._
    bpeTrainMergesRoundsFrom(bpeState0Counts(wc), BpeMerges, 1)._1
      .map { case (r, l, rr, c) => (r, l, rr, l + rr, c) }
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_round")
  }

  private[graft] def wpTrainOfWords(wc: DataFrame)
      : (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String]) =
    wpTrainFromState(bpeState0Counts(wc))

  /** Corpus fertility (unigram pieces per whitespace word, in ppm) of
    * a (w, wf) count frame under a FROZEN piece table — the maintained
    * tokenizer-stats lake's drift statistic. Fertility is a pure
    * function of the word-count table (Σ wf·pieces(w) / Σ wf), so the
    * drift leg reads the JOURNAL, never the corpus. Same left-join
    * char-per-piece fallback as the apply rollup: vocabulary-shifted
    * ingest (words with characters the frozen vocab never saw) prices
    * as character segmentation — which is exactly the fertility
    * blow-up a retrain trigger exists to catch. */
  private[graft] def unigramFertilityPpmOfWords(wc: DataFrame,
      pieces: Seq[(String, Double)],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame =
    unigramFertilityPpmByGroup(wc.withColumn("grp", lit("all")), "grp",
      pieces, memo).drop("grp")

  /** Grouped form over a (groupCol, w, wf) frame: segmentation is a
    * pure function of the WORD, so the Viterbi chain runs ONCE over
    * the distinct-word union and every group's fertility is a rollup
    * against it — the drift leg prices base and appended ingest from
    * one DP pass instead of two (measured 30 s → half at sf0.1; the
    * unrolled rounds dominate, not the data). */
  private[graft] def unigramFertilityPpmByGroup(wc: DataFrame, groupCol: String,
      pieces: Seq[(String, Double)],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame = {
    val s = wc.sparkSession
    import s.implicits._
    val words = memo(wc.select(col("w")).distinct()
      .withColumn("wf", lit(1L))
      .withColumn("p", substring(col("w"), 1, UniMaxWord))
      .withColumn("plen", length(col("p"))))
    val np = uniViterbi(words, pieces.toDF("piece", "p0"), memo)
      .select(col("w"), size(split(col("path"), UniSep)).as("n_pieces"))
    wc.join(np, Seq("w"), "left")
      .groupBy(groupCol)
      .agg(sum(col("wf")).as("n_words"),
        sum(col("wf") * coalesce(col("n_pieces"),
          least(length(col("w")), lit(UniMaxWord)))).as("n_pieces"))
      .select(col(groupCol), col("n_words"), col("n_pieces"),
        // widen the ppm multiply: n_pieces reaches ~20x the token
        // count, so n_pieces*1e6 wraps int64 past ~9.2e12 pieces (a
        // 100 TB corpus is ~2e13 tokens); the DECIMAL(38,0) product
        // divides back to a <=2e7 long at any scale
        expr("CAST(n_pieces AS DECIMAL(38,0)) * 1000000L div n_words")
          .as("fertility_ppm"))
  }

  /** WordPiece UNK-word rate (ppm, occurrence-weighted) of a
    * (groupCol, w, wf) count frame under FROZEN vocab tables — the
    * drift verdict's second statistic (the r16 verdict's blind spot:
    * a vocabulary shift that blows up WP's whole-word rejections
    * while unigram fertility stays flat — new scripts, new charsets —
    * must trip the retrain flag too). Same one-chase-per-distinct-word
    * shape as the fertility leg: segmentation is a pure function of
    * the WORD, so the greedy chase runs once over the distinct-word
    * union and every group's rate is a rollup against it. The left
    * join's UNK fallback is unreachable by construction (the chase
    * covers every journal word) but keeps a missing word priced as
    * the conservative verdict. */
  private[graft] def wpUnkPpmByGroup(wc: DataFrame, groupCol: String,
      ivoc: Seq[String], cvoc: Seq[String],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame = {
    val seg = wpSegmentsOfWords(wc.select(col("w").as("word")), ivoc, cvoc, memo)
      .withColumnRenamed("word", "w")
    wc.join(seg.select(col("w"), col("unk")), Seq("w"), "left")
      .groupBy(groupCol)
      .agg(sum(col("wf")).as("n_words"),
        sum(when(coalesce(col("unk"), lit(true)), col("wf"))
          .otherwise(lit(0L))).as("n_unk"))
      // same DECIMAL(38,0) widening as the fertility ppm: the product
      // must survive 100 TB word mass, the quotient is always ≤ 10⁶
      .select(col(groupCol),
        expr("CAST(n_unk AS DECIMAL(38,0)) * 1000000L div n_words")
          .as("wp_unk_ppm"))
  }

  /** The trained piece table as driver values — bounded at
    * chars + [[UniTopV]] rows by construction (the BPE-rules
    * convention: the streaming segmenter carries the artifact as plain
    * values, frozen between tokenizer retrains). */
  private[graft] def unigramPieces(s: SparkSession, dir: String): Seq[(String, Double)] = {
    val (_, voc, _) = uniBuild(s, dir)
    voc.select("piece", "p0").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
  }

  /** Segment-and-rollup over an arbitrary (doc_id, text) frame with a
    * FIXED piece table — the streaming segmenter's core; `memo`
    * injects persist-based materialization for long-lived streams. */
  private[graft] def unigramApplyWith(docs: DataFrame,
      pieces: Seq[(String, Double)],
      memo: DataFrame => DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val voc = pieces.toDF("piece", "p0")
    val words = memo(docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wf"))
      .withColumn("p", substring(col("w"), 1, UniMaxWord))
      .withColumn("plen", length(col("p"))))
    uniApplyRollup(docs, uniViterbi(words, voc, memo))
  }

  // a DEF, not a val: it reads unigramTrainSql, declared BELOW — a val
  // here would initialize first and slice a null (the RecallK lesson)
  private def unigramApplySql: String = {
    // the shared chain: everything up to `seg` is the train oracle's
    val trainChain = unigramTrainSql
    val upToSeg = trainChain.substring(0, trainChain.indexOf(",\nem AS ("))
    s"""$upToSeg,
       |npieces AS (SELECT w AS word, CAST(len(string_split(path, chr(1))) AS INTEGER) AS n_pieces
       |            FROM seg),
       |occ AS (
       |  SELECT doc_id, word, count(*) AS n_occ
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1, 2)
       |SELECT o.doc_id,
       |       CAST(sum(n_occ) AS BIGINT) AS n_tokens_ws,
       |       CAST(sum(n_occ * n_pieces) AS BIGINT) AS n_uni_pieces,
       |       ${ratioSql("CAST(sum(n_occ * n_pieces) AS DOUBLE)", "CAST(sum(n_occ) AS DOUBLE)")} AS pieces_per_word
       |FROM occ o JOIN npieces USING (word)
       |GROUP BY 1 ORDER BY o.doc_id""".stripMargin
  }

  /** The unrolled-DP CTE chain over piece table `voc`, CTEs prefixed
    * `dp$sfx` / `seg$sfx` — ONE generator for the seed chain and the
    * post-prune re-segmentation so the twins cannot drift. */
  private def uniDpChainSql(voc: String, sfx: String): String = {
    val dpRounds = (1 to UniMaxWord).map { j =>
      val branches = (1 to math.min(UniMaxPiece, j)).map { k =>
        s"""      SELECT d.w, d.wf, d.p, d.plen, d.score * v.p0 AS score,
           |             CASE WHEN d.path = '' THEN v.piece
           |                  ELSE d.path || chr(1) || v.piece END AS path
           |      FROM dp$sfx${j - k} d JOIN $voc v
           |        ON d.plen >= $j AND v.piece = substr(d.p, ${j - k + 1}, $k)""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""dp$sfx$j AS MATERIALIZED (
         |  SELECT w, wf, p, plen, score, path FROM (
         |    SELECT c.*, row_number() OVER (PARTITION BY w
         |      ORDER BY score DESC, path) AS rn FROM (
         |$branches
         |    ) c)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val segs = (1 to UniMaxWord)
      .map(j => s"SELECT w, wf, path FROM dp$sfx$j WHERE plen = $j")
      .mkString("\nUNION ALL\n")
    s"""dp${sfx}0 AS MATERIALIZED (
       |  SELECT w, wf, p, plen, CAST(1.0 AS DOUBLE) AS score, '' AS path FROM words),
       |$dpRounds,
       |seg$sfx AS MATERIALIZED (
       |$segs)""".stripMargin
  }

  private val unigramTrainSql: String = {
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wf,
       |         left(w, $UniMaxWord) AS p, length(left(w, $UniMaxWord)) AS plen
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |posf AS MATERIALIZED (
       |  SELECT wf, p, plen, CAST(s AS INTEGER) AS s
       |  FROM (SELECT wf, p, plen, unnest(generate_series(1, plen)) AS s
       |        FROM words)),
       |multi AS (
       |  SELECT piece, cnt FROM (
       |    SELECT substr(p, s, l) AS piece, CAST(sum(wf) AS BIGINT) AS cnt
       |    FROM posf, (SELECT unnest(generate_series(2, $UniMaxPiece)) AS l)
       |    WHERE s + l - 1 <= plen
       |    GROUP BY 1)
       |  ORDER BY cnt DESC, piece LIMIT $UniTopV),
       |chars AS (
       |  SELECT substr(p, s, 1) AS piece, CAST(sum(wf) AS BIGINT) AS cnt
       |  FROM posf GROUP BY 1),
       |vocab0 AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |voc AS MATERIALIZED (
       |  SELECT piece, cnt,
       |         CAST(cnt AS DOUBLE) / (SELECT CAST(sum(cnt) AS DOUBLE) FROM vocab0) AS p0
       |  FROM vocab0),
       |${uniDpChainSql("voc", "")},
       |em AS (
       |  SELECT piece, CAST(sum(wf) AS BIGINT) AS em_count
       |  FROM (SELECT wf, unnest(string_split(path, chr(1))) AS piece FROM seg)
       |  GROUP BY 1)
       |SELECT v.piece, v.cnt AS seed_count,
       |       coalesce(em.em_count, 0) AS em_count,
       |       CAST(CAST(coalesce(em.em_count, 0) AS HUGEINT) * 1000000 //
       |            (SELECT sum(em_count) FROM em) AS BIGINT) AS score_ppm
       |FROM voc v LEFT JOIN em USING (piece)
       |ORDER BY piece""".stripMargin
  }

  // --- tokenizer_unigram_prune: the prune / re-segment leg -------------
  // SentencePiece's distinctive training move: after EM, drop the
  // pieces whose removal costs the least likelihood and re-segment —
  // the loop that shrinks a seed vocabulary to the target size. Here
  // one prune step over the shared build: the bottom-[[UniPruneK]]
  // MULTI-CHAR pieces by EM mass go (characters never prune —
  // coverage), the survivor scores RENORMALIZE (a constant factor is
  // NOT neutral under max-product: paths have different piece counts,
  // so the un-renormalized model would bias toward shorter
  // segmentations), and the SAME Viterbi chain re-segments every word
  // under the pruned model. Output per original piece: pruned flag,
  // EM mass before/after, re-normalized score — the before/after
  // audit a vocabulary-size decision reads. Piece mass can only grow
  // (pruned pieces' words re-segment into more, smaller pieces) —
  // spec-pinned conservation direction.

  private val UniPruneK = 8

  /** Cached BUILD artifacts of the prune step — the scored
    * before-mass table, the pruned-piece pick, and the re-segmented
    * word table (the second Viterbi). The audit rollup below stays a
    * per-call query like every artifact-backed op's serve (caching
    * the whole output would bench the cache, not the op). */
  private val uniPruneCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (DataFrame, DataFrame, DataFrame)]()

  /** Flush both unigram build caches for a lake prefix — wired into
    * the re-ANALYZE invalidation like the BPE/WordPiece caches (a
    * regenerated lake must not serve a stale piece table), and called
    * directly by the ×16 gate's @cold row to time the build path. */
  private[graft] def invalidateUnigram(dirPrefix: String): Unit =
    Seq[java.util.concurrent.ConcurrentHashMap[(String, String), _]](
      uniCache, uniPruneCache).foreach { c =>
      val it = c.keySet().iterator()
      while (it.hasNext) if (it.next()._2.startsWith(dirPrefix)) it.remove()
    }
  graft.etl.TableStats.registerInvalidationHook(invalidateUnigram)

  private def uniPruneBuild(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    graft.functions.buildCached(s, uniPruneCache, (s.sparkContext.applicationId, dir)) {
      val (words, voc, seg) = uniBuild(s, dir)
      val em = seg.select(col("wf"), explode(split(col("path"), UniSep)).as("piece"))
        .groupBy("piece").agg(sum("wf").as("em_before"))
      val emv = voc.join(em, Seq("piece"), "left")
        .withColumn("em_before", coalesce(col("em_before"), lit(0L)))
        .transform(graft.functions.memoize)
      val pruned = emv.filter(length(col("piece")) >= 2)
        .orderBy(col("em_before"), col("piece")).limit(UniPruneK)
        .select(col("piece"))
        .transform(graft.functions.memoize)
      val voc2base = emv.join(pruned, Seq("piece"), "left_anti")
        .select(col("piece"), col("cnt"))
      val tot2 = voc2base.agg(sum("cnt").as("t2"))
      val voc2 = voc2base.crossJoin(broadcast(tot2))
        .select(col("piece"), col("cnt"),
          (col("cnt").cast(DoubleType) / col("t2").cast(DoubleType)).as("p0"))
        .transform(graft.functions.memoize)
      (emv, pruned, uniViterbi(words, voc2))
    }

  private def unigramPrune(s: SparkSession, dir: String): DataFrame = {
    val (emv, pruned, seg2) = uniPruneBuild(s, dir)
    val em2 = seg2.select(col("wf"), explode(split(col("path"), UniSep)).as("piece"))
      .groupBy("piece").agg(sum("wf").as("em_after"))
      .transform(graft.functions.memoize) // output join + the ppm total
    val totE2 = em2.agg(sum("em_after").as("te2"))
    emv.join(pruned.withColumn("isp", lit(true)), Seq("piece"), "left")
      .join(em2, Seq("piece"), "left")
      .crossJoin(broadcast(totE2))
      .select(col("piece"),
        coalesce(col("isp"), lit(false)).as("pruned"),
        col("em_before"),
        coalesce(col("em_after"), lit(0L)).as("em_after"),
        expr("CAST(coalesce(em_after, 0L) AS DECIMAL(38,0)) * 1000000L div te2")
          .as("score_ppm_after"))
      .transform(graft.functions.checkpointBeforeSort)
      .orderBy("piece")
  }

  // a DEF for the same declaration-order reason as unigramApplySql
  private def unigramPruneSql: String = {
    val trainChain = unigramTrainSql
    val upToSeg = trainChain.substring(0, trainChain.indexOf(",\nem AS ("))
    s"""$upToSeg,
       |emb AS (
       |  SELECT piece, CAST(sum(wf) AS BIGINT) AS em_before
       |  FROM (SELECT wf, unnest(string_split(path, chr(1))) AS piece FROM seg)
       |  GROUP BY 1),
       |emv AS MATERIALIZED (
       |  SELECT v.piece, v.cnt, coalesce(emb.em_before, 0) AS em_before
       |  FROM voc v LEFT JOIN emb USING (piece)),
       |prn AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, em_before FROM emv WHERE length(piece) >= 2
       |    ORDER BY em_before, piece LIMIT $UniPruneK)),
       |voc2 AS MATERIALIZED (
       |  SELECT piece, cnt,
       |         CAST(cnt AS DOUBLE) /
       |         (SELECT CAST(sum(cnt) AS DOUBLE) FROM emv
       |          WHERE piece NOT IN (SELECT piece FROM prn)) AS p0
       |  FROM emv WHERE piece NOT IN (SELECT piece FROM prn)),
       |${uniDpChainSql("voc2", "b")},
       |em2 AS (
       |  SELECT piece, CAST(sum(wf) AS BIGINT) AS em_after
       |  FROM (SELECT wf, unnest(string_split(path, chr(1))) AS piece FROM segb)
       |  GROUP BY 1)
       |SELECT e.piece, e.piece IN (SELECT piece FROM prn) AS pruned,
       |       e.em_before, coalesce(em2.em_after, 0) AS em_after,
       |       CAST(CAST(coalesce(em2.em_after, 0) AS HUGEINT) * 1000000 //
       |            (SELECT sum(em_after) FROM em2) AS BIGINT) AS score_ppm_after
       |FROM emv e LEFT JOIN em2 USING (piece)
       |ORDER BY piece""".stripMargin
  }

  // --- tokenizer_wordpiece_train: likelihood-scored merge learning ----
  // The THIRD production tokenizer family (Schuster & Nakajima 2012;
  // the BERT lineage): same fuse mechanics as BPE, different SELECTION
  // criterion — each round merges the adjacent pair maximizing
  // cnt(a,b) / (cnt(a)·cnt(b)), the pairwise likelihood gain of a
  // unigram LM, instead of raw pair frequency. Deterministic,
  // engine-portable instantiation: the score key is the EXACT integer
  // floor(cnt·10¹² / (cnt(a)·cnt(b))) — BigInt on the driver, HUGEINT
  // in DuckDB, so the two engines pick bit-identical winners (ties
  // break (lhs, rhs); the key is ≤ 10¹² because cnt ≤ min(cnt(a),
  // cnt(b)), so it always fits int64 in the OUTPUT even at 100 TB
  // counts). Scale shape identical to the BPE trainer: one
  // map-side-combinable word-frequency pass + TakeOrdered(V) cut, then
  // K rounds over the vocab-BOUNDED symbol table ([[bpeState0]] /
  // [[bpeFuse]] shared verbatim — the fuse semantics cannot drift
  // between the two trainers); per-round pair/symbol counts collect at
  // metadata scale (≤ state rows, bounded by V×word-length).

  private val WpMerges = 6
  private val WpMaxWord = 20

  /** Learned merges (round, lhs, rhs, pairCnt, lhsCnt, rhsCnt,
    * scorePpt) plus the greedy-match vocabulary the apply serves:
    * word-INITIAL pieces (final-state symbols at pos 0) and
    * CONTINUATION pieces (symbols at pos > 0 — the `##`-prefixed table
    * of a production WordPiece), each floored by the train corpus's
    * single characters for coverage. */
  private[graft] def wpTrainOf(docs: DataFrame)
      : (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String]) =
    wpTrainFromState(bpeState0(docs))

  /** The WordPiece train loop over a prepared seed state — shared by
    * the docs path and the count-lake retrain path. */
  private[graft] def wpTrainFromState(state0: DataFrame)
      : (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String]) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("word").orderBy("pos")
    var state = state0
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long, Long, Long, Long)]
    val scale = BigInt(1000000000000L)
    var exhausted = false
    while (out.size < WpMerges && !exhausted) {
      // both collects are vocab-bounded (≤ V×word-length rows) — the
      // MLlib-centroid-iteration driver-traffic shape, never corpus
      val syms = state.groupBy("sym").agg(sum("wc").as("sc"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val pairs = state.withColumn("nxt", lead("sym", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
        .agg(sum("wc").as("cnt"))
        .collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val best = pairs.map { r =>
          val (l, rr, c) = (r.getString(0), r.getString(1), r.getLong(2))
          val key = (BigInt(c) * scale) / (BigInt(syms(l)) * BigInt(syms(rr)))
          (key, l, rr, c)
        }.minBy { case (k, l, rr, _) => (-k, l, rr) }(
          Ordering.Tuple3(Ordering.BigInt, Ordering.String, Ordering.String))
        val (key, l, rr, c) = best
        out += ((out.size + 1, l, rr, c, syms(l), syms(rr), key.toLong))
        state = bpeFuse(state, lit(l), lit(rr)).localCheckpoint()
      }
    }
    val chars = state.select(col("word")).distinct()
      .select(explode(split(col("word"), "")).as("piece"))
    val ivoc = state.filter(col("pos") === 0).select(col("sym").as("piece"))
      .union(chars).distinct().collect().map(_.getString(0)).sorted.toSeq
    val cvoc = state.filter(col("pos") > 0).select(col("sym").as("piece"))
      .union(chars).distinct().collect().map(_.getString(0)).sorted.toSeq
    (out.toSeq, ivoc, cvoc)
  }

  private val wpCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String),
    (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String],
      DataFrame)]()

  /** Memoized train artifacts per (application, lake) — the bpeRules
    * convention: ONE training pass serves the train table, the apply
    * segmentation, and the streaming segmenter (which carries the two
    * vocab tables as frozen driver values between retrains). The
    * LAKE's greedy-chase segmentation is part of the build (the
    * uniBuild convention): the 20 chase rounds run once per corpus
    * snapshot, and every apply call pays only the occurrence rollup. */
  private[graft] def wpBuild(s: SparkSession, dir: String)
      : (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String],
        DataFrame) =
    graft.functions.buildCached(s, wpCache, (s.sparkContext.applicationId, dir)) {
      val docs = Tables.documents(s, dir)
      val (rules, ivoc, cvoc) = wpTrainOf(docs)
      (rules, ivoc, cvoc, wpSegmentsWith(docs, ivoc, cvoc))
    }

  private[graft] def invalidateWp(dirPrefix: String): Unit = {
    val it = wpCache.keySet().iterator()
    while (it.hasNext) if (it.next()._2.startsWith(dirPrefix)) it.remove()
  }
  graft.etl.TableStats.registerInvalidationHook(invalidateWp)

  private def wpTrain(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    wpBuild(s, dir)._1
      .map { case (r, l, rr, c, la, rb, sk) => (r, l, rr, l + rr, c, la, rb, sk) }
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count",
        "lhs_count", "rhs_count", "score_ppt")
      .orderBy("merge_round")
  }

  // --- tokenizer_wordpiece_apply: greedy longest-match segmentation ---
  // WordPiece's distinctive SERVE: no lattice, no scores — from each
  // word's start, repeatedly take the LONGEST vocabulary piece that
  // matches (word-initial table at position 0, continuation table
  // after), and if no piece matches the whole word maps to one [UNK]
  // token (so "ab"+nothing-for-"c" is UNK even when "a"+"bc" would
  // segment — the greedy commitment real WordPiece makes; spec-pinned).
  // Distributed shape: the greedy chase is a FUNCTION of position —
  // jump(s) = max piece length matching at s — so one vocab-broadcast
  // join builds the per-(word, position) jump table at vocab scale and
  // [[WpMaxWord]] unrolled rounds follow the chain (each jump advances
  // ≥ 1 char, so every word terminates within the bounded-prefix
  // window; the editdist prefix convention). The corpus is touched by
  // exactly two map-side-combinable passes (distinct words, occurrence
  // counts), never by the iteration — the bpeApply/unigramApply shape.

  /** Segment-and-rollup with FIXED vocab tables — shared by the batch
    * op and the streaming segmenter; `memo` is the usual
    * materialization injection (per-round state feeds the next join). */
  private[graft] def wpApplyWith(docs: DataFrame,
      ivoc: Seq[String], cvoc: Seq[String],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame =
    wpRollup(docs, wpSegmentsWith(docs, ivoc, cvoc, memo))

  /** The greedy-chase segmentation of `docs`' distinct words under
    * FIXED vocab tables → one (word, np, unk) row per word. Split from
    * the rollup so the LAKE's segmentation can live in the build cache
    * (the uniBuild convention — one chase serves every batch-op call)
    * while the streaming segmenter chases each micro-batch's own
    * word table. */
  private[graft] def wpSegmentsWith(docs: DataFrame,
      ivoc: Seq[String], cvoc: Seq[String],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame =
    wpSegmentsOfWords(
      docs.select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0),
      ivoc, cvoc, memo)

  /** The greedy chase over an ARBITRARY word frame (col `word`, not
    * necessarily distinct) — the docs path above and the maintained
    * vocab lake's journal-only WP UNK-rate drift leg both route here
    * (drift prices the journal's word table, never the corpus). */
  private[graft] def wpSegmentsOfWords(words0: DataFrame,
      ivoc: Seq[String], cvoc: Seq[String],
      memo: DataFrame => DataFrame = graft.functions.memoize): DataFrame = {
    val s = words0.sparkSession
    import s.implicits._
    // the longest piece bounds the candidate explode (driver-known:
    // the vocab is the frozen artifact); the oracle's static 1..20
    // range is equivalent because longer candidates match nothing.
    // `:+ 1` guards the degenerate EMPTY vocab (a journal/corpus where
    // no word survives the >=2 lowercase-alnum pre-tokenizer cut):
    // with both tables empty the jump join matches nothing and every
    // word rolls up as [UNK], which is the correct WordPiece verdict —
    // the reduction must not throw before that happens
    val maxK = math.min(WpMaxWord, ((ivoc ++ cvoc).map(_.length) :+ 1).max)
    val words = memo(words0.select(col("word")).distinct()
      .withColumn("p", substring(col("word"), 1, WpMaxWord))
      .withColumn("plen", length(col("p"))))
    val cand = words
      .select(col("word"), col("p"), col("plen"),
        explode(sequence(lit(0), col("plen") - 1)).as("s"))
      .select(col("word"), col("plen"), col("s"),
        explode(sequence(lit(1), least(lit(maxK), col("plen") - col("s")))).as("k"),
        expr("substr(p, s + 1, k)").as("piece"))
    val vocDf = (ivoc.map((_, true)) ++ cvoc.map((_, false))).toDF("piece", "ini")
    val jmp = memo(cand.withColumn("ini", col("s") === 0)
      .join(broadcast(vocDf), Seq("piece", "ini"))
      .groupBy("word", "s").agg(max(col("k")).as("jump"))
      .withColumnRenamed("word", "jw"))
    var st = memo(words.select(col("word"), col("plen"),
      lit(0).as("pos"), lit(0L).as("np"), lit(false).as("unk")))
    for (_ <- 1 to WpMaxWord) {
      st = memo(st.join(jmp,
          col("word") === col("jw") && col("pos") === col("s") &&
            !col("unk") && col("pos") < col("plen"), "left")
        .select(col("word"), col("plen"),
          when(col("unk") || col("pos") >= col("plen"), col("pos"))
            .otherwise(col("pos") + coalesce(col("jump"), lit(0))).as("pos"),
          when(col("unk") || col("pos") >= col("plen"), col("np"))
            .when(col("jump").isNull, lit(1L))
            .otherwise(col("np") + lit(1L)).as("np"),
          (col("unk") ||
            (col("pos") < col("plen") && col("jump").isNull)).as("unk")))
    }
    st.select(col("word"), col("np"), col("unk"))
  }

  /** Per-doc rollup of a (word, np, unk) segmentation — corpus touched
    * by one map-side-combinable occurrence pass; the join is
    * vocab-scale. */
  private[graft] def wpRollup(docs: DataFrame, seg: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n_occ"))
    occ.join(seg.select(col("word"), col("np"), col("unk")), "word")
      .groupBy("doc_id")
      .agg(sum("n_occ").as("n_tokens_ws"),
        sum(col("n_occ") * col("np")).as("n_wp_pieces"),
        sum(when(col("unk"), col("n_occ")).otherwise(lit(0L))).as("n_unk_words"))
      .select(col("doc_id"), col("n_tokens_ws"), col("n_wp_pieces"),
        col("n_unk_words"),
        ratio(col("n_wp_pieces").cast(DoubleType),
          col("n_tokens_ws").cast(DoubleType)).as("pieces_per_word"))
      .orderBy("doc_id")
  }

  private def wpApply(s: SparkSession, dir: String): DataFrame = {
    val (_, _, _, seg) = wpBuild(s, dir)
    wpRollup(Tables.documents(s, dir), seg)
  }

  /** Train-chain CTEs for the WordPiece oracle — [[bpeTrainCtes]]'s
    * fuse arithmetic verbatim, with the round winner picked by the
    * exact HUGEINT score key instead of raw pair count. */
  private def wpTrainCtes: String = {
    val rounds = (1 to WpMerges).map { r =>
      s"""wq$r AS MATERIALIZED (
         |  SELECT word, wc, pos, sym,
         |         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM ws${r - 1}),
         |wy$r AS MATERIALIZED (
         |  SELECT sym, CAST(sum(wc) AS BIGINT) AS sc FROM ws${r - 1} GROUP BY 1),
         |wt$r AS MATERIALIZED (
         |  SELECT lhs, rhs, cnt, la, rb,
         |         CAST((CAST(cnt AS HUGEINT) * 1000000000000) //
         |              (CAST(la AS HUGEINT) * rb) AS BIGINT) AS score_ppt
         |  FROM (
         |    SELECT p.lhs, p.rhs, p.cnt, a.sc AS la, b.sc AS rb
         |    FROM (SELECT sym AS lhs, nxt AS rhs, CAST(sum(wc) AS BIGINT) AS cnt
         |          FROM wq$r WHERE nxt IS NOT NULL GROUP BY 1, 2) p
         |    JOIN wy$r a ON p.lhs = a.sym JOIN wy$r b ON p.rhs = b.sym)
         |  ORDER BY score_ppt DESC, lhs, rhs LIMIT 1),
         |wk$r AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |           row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rnk
         |    FROM (
         |      SELECT q.word, q.pos,
         |             q.pos - row_number() OVER (PARTITION BY q.word ORDER BY q.pos) AS grp
         |      FROM wq$r q, wt$r t WHERE q.sym = t.lhs AND q.nxt = t.rhs))
         |  WHERE rnk % 2 = 1),
         |ws$r AS MATERIALIZED (
         |  SELECT word, wc,
         |         CAST(row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS INTEGER) AS pos,
         |         sym
         |  FROM (
         |    SELECT q.word, q.wc, q.pos,
         |           CASE WHEN k.pos IS NOT NULL THEN q.sym || q.nxt ELSE q.sym END AS sym
         |    FROM wq$r q
         |    LEFT JOIN wk$r k  ON q.word = k.word  AND q.pos = k.pos
         |    LEFT JOIN wk$r kc ON q.word = kc.word AND q.pos = kc.pos + 1
         |    WHERE kc.pos IS NULL))""".stripMargin
    }.mkString(",\n")
    s"""wwcnt AS MATERIALIZED (
       |  SELECT word, count(*) AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+${"$"}')
       |  GROUP BY 1 ORDER BY wc DESC, word LIMIT $BpeVocabWords),
       |ws0 AS MATERIALIZED (
       |  SELECT word, wc, CAST(i - 1 AS INTEGER) AS pos,
       |         cs[CAST(i AS INTEGER)] AS sym
       |  FROM (SELECT word, wc, string_split(word, '') AS cs,
       |          unnest(generate_series(1, length(word))) AS i FROM wwcnt)),
       |$rounds""".stripMargin
  }

  private def wpTrainSql: String = {
    val out = (1 to WpMerges).map(r =>
      s"""SELECT $r AS merge_round, lhs, rhs, lhs || rhs AS merged,
         |       cnt AS pair_count, la AS lhs_count, rb AS rhs_count, score_ppt
         |FROM wt$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH $wpTrainCtes
       |SELECT * FROM ($out)
       |ORDER BY merge_round""".stripMargin
  }

  /** Apply oracle: derive both vocab tables from the train chain's
    * final state, build the jump table, replay the greedy chase as
    * [[WpMaxWord]] unrolled LEFT-JOIN rounds, roll up per doc. */
  private def wpApplySql: String = {
    val chase = (1 to WpMaxWord).map { r =>
      s"""wc$r AS MATERIALIZED (
         |  SELECT c.word, c.plen,
         |         CAST(CASE WHEN c.unk OR c.pos >= c.plen THEN c.pos
         |              ELSE c.pos + COALESCE(j.jump, 0) END AS INTEGER) AS pos,
         |         CAST(CASE WHEN c.unk OR c.pos >= c.plen THEN c.np
         |              WHEN j.jump IS NULL THEN 1 ELSE c.np + 1 END AS BIGINT) AS np,
         |         (c.unk OR (c.pos < c.plen AND j.jump IS NULL)) AS unk
         |  FROM wc${r - 1} c LEFT JOIN wjmp j
         |    ON (NOT c.unk) AND c.pos < c.plen AND j.word = c.word AND j.s = c.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wpTrainCtes,
       |wchars AS MATERIALIZED (
       |  SELECT DISTINCT substr(word, CAST(i AS INTEGER), 1) AS piece
       |  FROM (SELECT word, unnest(generate_series(1, length(word))) AS i FROM wwcnt)),
       |wivoc AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |    SELECT sym AS piece FROM ws$WpMerges WHERE pos = 0
       |    UNION ALL SELECT piece FROM wchars)),
       |wcvoc AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |    SELECT sym AS piece FROM ws$WpMerges WHERE pos > 0
       |    UNION ALL SELECT piece FROM wchars)),
       |wapp AS MATERIALIZED (
       |  SELECT word, left(word, $WpMaxWord) AS p,
       |         CAST(length(left(word, $WpMaxWord)) AS INTEGER) AS plen
       |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0),
       |wcand AS MATERIALIZED (
       |  SELECT word, s, k, substr(p, s + 1, k) AS piece FROM (
       |    SELECT word, p, plen, CAST(sq.s AS INTEGER) AS s, CAST(kq.k AS INTEGER) AS k
       |    FROM wapp,
       |         (SELECT unnest(generate_series(0, ${WpMaxWord - 1})) AS s) sq,
       |         (SELECT unnest(generate_series(1, $WpMaxWord)) AS k) kq
       |    WHERE sq.s < plen AND sq.s + kq.k <= plen)),
       |wjmp AS MATERIALIZED (
       |  SELECT word, s, CAST(max(k) AS INTEGER) AS jump FROM (
       |    SELECT c.word, c.s, c.k FROM wcand c JOIN wivoc v USING (piece) WHERE c.s = 0
       |    UNION ALL
       |    SELECT c.word, c.s, c.k FROM wcand c JOIN wcvoc v USING (piece) WHERE c.s > 0)
       |  GROUP BY 1, 2),
       |wc0 AS MATERIALIZED (
       |  SELECT word, plen, 0 AS pos, CAST(0 AS BIGINT) AS np, FALSE AS unk FROM wapp),
       |$chase,
       |wocc AS (
       |  SELECT doc_id, word, count(*) AS n_occ
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1, 2)
       |SELECT o.doc_id,
       |       CAST(sum(n_occ) AS BIGINT) AS n_tokens_ws,
       |       CAST(sum(n_occ * np) AS BIGINT) AS n_wp_pieces,
       |       CAST(sum(CASE WHEN unk THEN n_occ ELSE 0 END) AS BIGINT) AS n_unk_words,
       |       ${ratioSql("CAST(sum(n_occ * np) AS DOUBLE)", "CAST(sum(n_occ) AS DOUBLE)")} AS pieces_per_word
       |FROM wocc o JOIN wc$WpMaxWord w ON o.word = w.word
       |GROUP BY 1 ORDER BY o.doc_id""".stripMargin
  }

  // --- tokenizer_fertility_report: the family-level audit ------------
  // The ann_recall_report analog for tokenizers: ONE table a
  // vocabulary decision actually reads — per corpus source, the
  // fertility (pieces per whitespace word) of all three trained
  // families (BPE merges, unigram-LM Viterbi, WordPiece greedy
  // longest-match) side by side, plus WordPiece's UNK-word rate (the
  // only family that can reject a word outright). Every column serves
  // off the SAME memoized builds as the per-family ops (one training
  // pass each — the report adds zero training cost), and the per-doc
  // rollups it aggregates ARE the three apply ops' outputs, so the
  // report can never drift from the ops it summarizes. Scale shape:
  // three vocab-scale joins + one source-keyed agg over per-doc rows;
  // the corpus text is never touched beyond the builds' own passes.
  // Oracle: the three apply oracles verbatim as derived tables (nested
  // WITH), joined on doc_id and aggregated per source — drift-proof by
  // construction.

  private def tokenizerFertilityReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // r17 (guide §2.6): the three per-family apply subtrees are
    // independent — constructing them concurrently overlaps the three
    // families' build-cache population (BPE/unigram/WordPiece training
    // chains) instead of paying them back-to-back; plans and results
    // are unchanged
    val Seq(b, u, w) = graft.functions.inParallel(
      () => bpeApply(s, dir).select(col("doc_id"),
        col("n_tokens_ws").as("ws_b"), col("n_bpe_tokens").as("np_b")),
      () => unigramApply(s, dir).select(col("doc_id"),
        col("n_tokens_ws").as("ws_u"), col("n_uni_pieces").as("np_u")),
      () => wpApply(s, dir).select(col("doc_id"),
        col("n_tokens_ws").as("ws_w"), col("n_wp_pieces").as("np_w"),
        col("n_unk_words").as("unk_w")))
    docs.select(col("doc_id"), col("source"))
      .join(b, "doc_id").join(u, "doc_id").join(w, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_b").as("sws_b"), sum("np_b").as("snp_b"),
        sum("ws_u").as("sws_u"), sum("np_u").as("snp_u"),
        sum("ws_w").as("sws_w"), sum("np_w").as("snp_w"),
        sum("unk_w").as("sunk_w"))
      .select(col("source"), col("n_docs"),
        ratio(col("snp_b").cast(DoubleType), col("sws_b").cast(DoubleType))
          .as("bpe_syms_per_word"),
        ratio(col("snp_u").cast(DoubleType), col("sws_u").cast(DoubleType))
          .as("uni_pieces_per_word"),
        ratio(col("snp_w").cast(DoubleType), col("sws_w").cast(DoubleType))
          .as("wp_pieces_per_word"),
        ratio(col("sunk_w").cast(DoubleType), col("sws_w").cast(DoubleType))
          .as("wp_unk_rate"))
      .orderBy("source")
  }

  private def tokenizerFertilityReportSql: String =
    s"""SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |       ${ratioSql("CAST(sum(b.n_bpe_tokens) AS DOUBLE)", "CAST(sum(b.n_tokens_ws) AS DOUBLE)")} AS bpe_syms_per_word,
       |       ${ratioSql("CAST(sum(u.n_uni_pieces) AS DOUBLE)", "CAST(sum(u.n_tokens_ws) AS DOUBLE)")} AS uni_pieces_per_word,
       |       ${ratioSql("CAST(sum(w.n_wp_pieces) AS DOUBLE)", "CAST(sum(w.n_tokens_ws) AS DOUBLE)")} AS wp_pieces_per_word,
       |       ${ratioSql("CAST(sum(w.n_unk_words) AS DOUBLE)", "CAST(sum(w.n_tokens_ws) AS DOUBLE)")} AS wp_unk_rate
       |FROM documents d
       |JOIN ($bpeApplySql) b USING (doc_id)
       |JOIN ($unigramApplySql) u USING (doc_id)
       |JOIN ($wpApplySql) w USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("tokenizer_bpe_train", bpeTrain, Some(bpeTrainSql), buildState = true),
    Op("tokenizer_fertility_report", tokenizerFertilityReport,
      Some(tokenizerFertilityReportSql), buildState = true),
    Op("tokenizer_wordpiece_train", wpTrain, Some(wpTrainSql), buildState = true),
    Op("tokenizer_wordpiece_apply", wpApply, Some(wpApplySql), buildState = true),
    Op("tokenizer_unigram_train", unigramTrain, Some(unigramTrainSql), buildState = true),
    Op("tokenizer_unigram_apply", unigramApply, Some(unigramApplySql), buildState = true),
    Op("tokenizer_unigram_prune", unigramPrune, Some(unigramPruneSql), buildState = true),
    Op("tokenizer_bpe_apply", bpeApply, Some(bpeApplySql), buildState = true),
    Op("text_bm25_topk", textBm25, Some(textBm25Sql), buildState = true),
    Op("text_stats", textStats, Some(textStatsSql)),
    Op("text_ngram_freq", textNgramFreq, Some(textNgramFreqSql)),
    Op("text_collocations", textCollocations, Some(textCollocationsSql)),
    Op("text_sample_per_source", textSample, Some(textSampleSql)),
    Op("text_heavy_hitters", textHeavyHitters, Some(textHeavyHittersSql)),
    Op("text_langid", textLangid, Some(textLangidSql)),
    Op("text_token_count", textTokenCount, Some(textTokenCountSql)),
    Op("text_fingerprint", textFingerprint, Some(textFingerprintSql)))
}
