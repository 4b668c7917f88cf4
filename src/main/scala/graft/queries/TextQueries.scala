package graft.queries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QuerySupport._
import graft.sources.Tables.{load, parallel}
import graft.functions.Timestamps
import graft.functions.TextFunctions
import graft.operators.{CorpusStats, Curation, DataQuality, Dedup, EntityResolution, Graph, IncrementalAgg, Itemsets, Maintenance, Merge, Profiling, Quantization, Relational, Retention, Sessionize, Similarity, TextDedup, TimeSeries}
/** Text analysis and quality: language/statistics signals,
  * readability, tokens, vocabulary, n-gram models, stylometry,
  * string distances.
  *
  * One registry entry per operator with its DuckDB oracle SQL
  * (driver contract, SURVEY.md §7); aggregated by
  * [[graft.SparkEntry]]. Bodies moved verbatim from SparkEntry
  * in the round-12 registry split — entry names, plans and
  * oracles are unchanged. */
private[graft] object TextQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- north-star: text analysis --------------------------------------
    "q22_text_stats" -> ((s, d) => {
      load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          length(col("text")).cast("long").as("text_len"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          size(array_distinct(TextFunctions.tokens(col("text")))).cast("long").as("n_distinct_tokens"),
          TextFunctions.typeTokenRatio(col("text")).as("ttr"))
        .transform(ordered1(_, col("doc_id")))
    }),


    "q23_text_quality" -> ((s, d) => {
      load(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"))
        .transform(ordered1(_, col("doc_id")))
    }),


    // Char n-gram Jaccard verification on LSH candidates (dedup family:
    // the tokenization-robust sibling of q26's token Jaccard).
    "q46_ngram_jaccard" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.ngramJaccardOnPairs(pairs, docs, "text", "doc_id", 3)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),


    // Repetition quality signals (Gopher/C4-style boilerplate filters).
    // No parallel(): repetitionSignals hash-repartitions by doc_id
    // itself (its one shuffle), which both spreads the single-row-group
    // scan and feeds both aggregation levels.
    "q51_repetition" -> ((s, d) => {
      CorpusStats.repetitionSignals(load(s, d, "documents"),
          "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),


    // Corpus-relative rare-token quality stats (C4/Gopher-style filter
    // input): rare = corpus frequency below the corpus mean, compared in
    // integers (c·V < T) so the oracle is bit-exact.
    "q68_rare_tokens" -> ((s, d) => {
      CorpusStats.rareTokenStats(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),


    // Composite quality filter (the C4/Gopher-style curation pass a
    // training corpus actually runs): per-row signals + both
    // corpus-relative aggregates joined on doc_id into one keep/drop
    // verdict. Every signal reuses a component already proven
    // hash-identical to DuckDB in its own query (q22/q23/q51/q68), so
    // the composite's double comparisons against literal thresholds are
    // engine-consistent by construction.
    "q70_quality_filter" -> ((s, d) => {
      val docs = load(s, d, "documents")
      val perRow = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.typeTokenRatio(col("text")).as("ttr"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"))
      val rep = CorpusStats.repetitionSignals(docs, "text", "doc_id")
        .select(col("doc_id"), col("top_bigram_frac"))
      val rare = CorpusStats.rareTokenStats(docs, "text", "doc_id")
        .select(col("doc_id"), col("rare_frac"))
      perRow.join(rep, "doc_id").join(rare, "doc_id")
        .withColumn("keep",
          col("n_tokens") >= 30 && col("ttr") >= 0.35 &&
            col("stopword_ratio") >= 0.03 && col("top_bigram_frac") < 0.08 &&
            col("rare_frac") <= 0.5)
        .orderBy("doc_id")
    }),


    // Corpus health report: the per-(source, lang) release "corpus card"
    // — volumes, mean quality signals, exact-dup fraction per cell.
    "q78_corpus_report" -> ((s, d) => {
      CorpusStats.corpusReport(parallel(load(s, d, "documents")),
          "text", "source", "lang")
        .orderBy("source", "lang")
    }),


    // Char-level Shannon entropy per document — the model-free gibberish
    // detector in the quality family (q22/q23/q51/q68 siblings).
    "q74_char_entropy" -> ((s, d) => {
      CorpusStats.charEntropy(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),


    // Unigram-LM perplexity proxy (CCNet/Gopher quality family): mean
    // per-token log-prob under the corpus's own add-0.5-smoothed unigram
    // distribution — the "too improbable = noise, too probable =
    // boilerplate" signal that complements q68's rare-token fractions.
    "q79_lm_quality" -> ((s, d) => {
      // no parallel(): the operator's own doc-id repartition is the
      // parallelizing exchange; ordered1 over a 5k-row result replaces
      // orderBy (whose range sampling re-executes the agg subtree)
      CorpusStats.lmLogProb(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),


    // Per-document TF-IDF top-3 terms: tf·ln(N/df) ranked per doc —
    // keyword extraction for topical mixture analysis.
    "q81_tfidf_topk" -> ((s, d) => {
      CorpusStats.tfIdfTopTerms(load(s, d, "documents"),
          "text", "doc_id", k = 3)
        .transform(ordered1(_, col("doc_id"), col("rank")))
    }),


    // Corpus bigram collocations with PMI (Church & Hanks '90): high
    // count + low PMI = templated boilerplate, high PMI = real phrases.
    "q88_collocations" -> ((s, d) => {
      CorpusStats.collocations(parallel(load(s, d, "documents")),
          "text", "doc_id", topK = 50)
    }),


    // Per-source token-length deciles as exact order statistics (the q45
    // rank-selection construction — no float interpolation).
    "q90_length_deciles" -> ((s, d) => {
      CorpusStats.lengthDeciles(parallel(load(s, d, "documents")),
          "text", "doc_id", "source")
        .transform(ordered1(_, col("source")))
    }),


    // Per-document 3-gram novelty vs all lower-id documents — the
    // crawl-saturation curve, computed exactly.
    "q97_ngram_novelty" -> ((s, d) => {
      CorpusStats.ngramNovelty(parallel(load(s, d, "documents")),
          "text", "doc_id", n = 3)
        .transform(ordered1(_, col("doc_id")))
    }),


    // Robust per-source length outliers: exact median + MAD fences.
    "q98_length_outliers" -> ((s, d) => {
      CorpusStats.lengthOutliers(parallel(load(s, d, "documents")),
          "text", "doc_id", "source", cutoff = 3.0)
        .transform(ordered1(_, col("source")))
    }),


    // Windowed co-occurrence PPMI (±3 tokens, unordered pairs) — the
    // count matrix behind PPMI word vectors; q88's skip-gram
    // generalization from one explode + one collapsed count table.
    "q118_cooc_ppmi" -> ((s, d) => {
      CorpusStats.cooccurrencePmi(parallel(load(s, d, "documents")),
          "text", window = 3, topK = 50)
    }),


    // Unicode NFC hygiene audit over a fixture that appends a combining-
    // sequence suffix to every doc_id % 7 == 0 doc — non-NFC text hashes
    // apart from its composed twin, so dedup needs this gate first.
    "q120_nfc_audit" -> ((s, d) => {
      val fx = load(s, d, "documents").withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" cafe\u0301"))).otherwise(col("text")))
      CorpusStats.normalizationAudit(fx, "text", "source")
        .transform(ordered1(_, col("source")))
    }),


    // Per-source unigram KL divergence from the pooled corpus — the
    // mixture-audit panel (register/language drift, template spam,
    // near-copy "independent" sources all read off it).
    "q103_source_divergence" -> ((s, d) => {
      CorpusStats.sourceDivergence(parallel(load(s, d, "documents")),
          "text", "source")
        .transform(ordered1(_, col("source")))
    }),


    // Per-source OOV rate under a corpus-count≥5 threshold vocabulary —
    // the tokenizer-coverage audit (one collapsed count table + token-
    // marginal window; no vocab join).
    "q105_oov_rate" -> ((s, d) => {
      CorpusStats.oovRate(parallel(load(s, d, "documents")),
          "text", "source", minCount = 5L)
        .transform(ordered1(_, col("source")))
    }),


    // Gopher-rule quality gate pass rates per source (word-count band,
    // mean-word-length band, ≥2 distinct stopwords).
    "q108_gopher_rules" -> ((s, d) => {
      CorpusStats.qualityRules(parallel(load(s, d, "documents")),
          "text", "source")
        .transform(ordered1(_, col("source")))
    }),


    // Vocabulary coverage curve at 50% / 90% / 99% of the token stream —
    // count-of-counts histogram, integer-exact threshold cut.
    "q110_zipf_coverage" -> ((s, d) => {
      CorpusStats.zipfCoverage(parallel(load(s, d, "documents")),
          "text", thresholdsPpm = Seq(500000L, 900000L, 990000L))
        .transform(ordered1(_, col("threshold_ppm")))
    }),


    // PII scrub over a deterministically PII-injected fixture (the corpus
    // itself is clean, so each row gets a synthetic email+phone suffix
    // built identically by the oracle).
    "q52_pii_scrub" -> ((s, d) => {
      parallel(load(s, d, "documents"))
        .withColumn("__pii", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-4242")))
        .select(col("doc_id"),
          TextFunctions.scrubPii(col("__pii")).as("scrubbed"))
        .transform(ordered1(_, col("doc_id")))
    }),


    // Corpus vocabulary: explode → partial-agg-collapsed count → top-k.
    "q53_vocab" -> ((s, d) => {
      CorpusStats.vocabulary(load(s, d, "documents"), "text", "doc_id",
          minCount = 5, topK = 100)
    }),


    // Held-out bigram NLL under an add-1 bigram LM trained on the rest
    // of the corpus: bigrams built per-row (slice+zip, no positional
    // join), scoring join moves bigram TYPES only.
    "q198_bigram_nll" -> ((s, d) => {
      CorpusStats.bigramNll(parallel(load(s, d, "documents")), "text",
          "doc_id", "source", holdoutMod = 7)
        .transform(ordered1(_, col("source")))
    }),


    // Corpus Flesch reading-ease from exact integer totals (words,
    // [.!?]+ sentences, vowel-run syllables) — one aggregation pass.
    "q199_readability" -> ((s, d) => {
      CorpusStats.readability(load(s, d, "documents"), "text", "source")
        .transform(ordered1(_, col("source")))
    }),


    // Burrows' Delta stylometry: per-source z-profiles over the top-50
    // corpus tokens, mean |z| distance per source pair — the
    // authorship-attribution read on "which sources write alike".
    "q216_stylometry" -> ((s, d) => {
      CorpusStats.burrowsDelta(parallel(load(s, d, "documents")), "text",
          "source", topK = 50)
        .transform(ordered1(_, col("source_a"), col("source_b")))
    }),


    // Simpson diversity panel per source: coincidence probability,
    // effective vocabulary, heaviest-type share — all-integer folds.
    "q228_simpson_diversity" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      CorpusStats.simpsonDiversity(docs, col("source"), col("text"))
        .transform(ordered1(_, col("group")))
    }),


    // Fuzzy name matching: the codegen'd Jaro-Winkler comparator over
    // PREFIX-blocked customer pairs (the EntityResolution discipline —
    // TextFunctions.jaroWinkler's own contract says "BLOCKED pairs
    // only"), global top-50 via TakeOrderedAndProject. The block key is
    // the name minus its last two characters: block SIZE is bounded by
    // the alphabet (≤100 digit tails here) no matter the corpus, so the
    // candidate-pair count grows LINEARLY in n — unlike the previous
    // c_nationkey block (25 fixed values → O(n²/25) pairs, ~45 B at
    // sf10). EntityResolution.link supplies the degenerate-block
    // fail-fast: any block whose pair product exceeds maxBlock raises
    // with the offending key instead of running a quadratic plan.
    "q233_jaro_names" -> ((s, d) => {
      // parallel(): the pair join broadcasts the right side, so the JW
      // kernel runs on the STREAMED side's partitioning — a single-file
      // scan gives 1-2 partitions and the ~1.5M JW evals run on 1-2 of
      // 32 cores (the q210/q131 lesson, round 13 A/B: 1.17 s → 0.47 s).
      val base = parallel(load(s, d, "customer")).select(
        expr("substring(c_name, 1, length(c_name) - 2)").as("blk"),
        col("c_custkey").as("id"), col("c_name").as("name"))
      EntityResolution.link(base, base, Seq("blk"),
          Seq(TextFunctions.jaroWinkler(col("name_a"), col("name_b"))),
          threshold = 0.0, maxBlock = 65536L)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), round(col("score"), 6).as("jw"))
        .orderBy(col("jw").desc, col("id_a").asc, col("id_b").asc)
        .limit(50)
    }),


    // Closest part-name pairs by TRUE Damerau-Levenshtein within
    // (brand, size) blocks — codegen'd Lowrance-Wagner kernel on a
    // blocked candidate frame, top-50 on the integer distance.
    "q244_damerau_names" -> ((s, d) => {
      val p = load(s, d, "part")
      val a = p.select(col("p_brand").as("bk"), col("p_size").as("sk"),
        col("p_partkey").as("id_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("bk"), col("p_size").as("sk"),
        col("p_partkey").as("id_b"), col("p_name").as("name_b"))
      a.join(b, Seq("bk", "sk")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          TextFunctions.damerauLevenshtein(col("name_a"), col("name_b"))
            .as("dl"))
        .orderBy(col("dl").asc, col("id_a").asc, col("id_b").asc)
        .limit(50)
    }),


    // Unigram entropy rate per source (bits/token): the compression /
    // diversity read — one Zipf-collapsed aggregation + per-source fold.
    "q220_entropy_rate" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val counts = docs.filter(col("text").isNotNull)
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("__c"))
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      val p = col("__c").cast("double") / col("__n").cast("double")
      counts.withColumn("__n", sum(col("__c")).over(ws))
        .groupBy(col("source"))
        .agg(max(col("__n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          round(sum(-p * log(p)) / lit(math.log(2.0)), 6)
            .as("bits_per_token"))
        .transform(ordered1(_, col("source")))
    }),


    // Closed-vocab tokenizer audit: fertility / OOV / compression per
    // source at three candidate vocabulary sizes (top-V tokens, OOV
    // falls back to character shatter) — the curves a tokenizer team
    // reads before committing a vocab size. Round-13 addition under the
    // substantive-oracle policy: the oracle replays the full 1M-token
    // explode twice plus a ranked-vocab join.
    "q260_vocab_fertility" -> ((s, d) => {
      CorpusStats.vocabFertility(parallel(load(s, d, "documents")),
          "text", "source", vocabSizes = Seq(100, 1000, 5000))
        .transform(ordered1(_, col("vocab_size"), col("source")))
    }),


    // Trigram Stupid-Backoff NLL (Brants et al. '07) over a 5x
    // token-distinct replicated corpus — the oracle row docNllBackoff
    // lacked for two rounds (its plain-corpus DuckDB program measured
    // ~0.17 s, under the substantive bar; replication with per-replica
    // token suffixes multiplies genuine model key mass, and the output
    // stays the ORIGINAL docs' scores). Round-14 addition under the
    // substantive-oracle policy (1.75 s measured before building).
    "q266_docnll_backoff" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 4).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      CorpusStats.docNllBackoff(
          parallel(reps.reduce(_ unionByName _)), "text", "doc_id",
          holdoutMod = 10, alpha = 0.4, k = 1.0)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),


    // Trigram Jelinek-Mercer interpolated NLL over the same 5x
    // token-distinct replicated corpus as q266 — the linear-mixture
    // smoothing family next to Stupid Backoff, sharing the per-order
    // type tables. Round-15 addition under the substantive-oracle
    // policy (1.47 s measured before building).
    "q267_docnll_jm" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 4).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      CorpusStats.docNllInterpolated(
          parallel(reps.reduce(_ unionByName _)), "text", "doc_id",
          holdoutMod = 10, lambda3 = 0.7, lambda2 = 0.2, lambda1 = 0.1,
          k = 1.0)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),


    // Per-document held-out bigram add-1 NLL (the CCNet-style
    // perplexity filter) — docNll's oracle row (the LM family's last;
    // formerly unit-test-only), over a 10x token-distinct replicated corpus (the
    // bigram model is cheaper than q266/q267's trigrams, so the 5x
    // fixture ran under the substantive-oracle bar). Round-15 addition
    // (0.84 s measured before building).
    "q270_docnll" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 9).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      CorpusStats.docNll(
          parallel(reps.reduce(_ unionByName _)), "text", "doc_id",
          holdoutMod = 10, k = 1.0)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),


    // Kneser-Ney discounted bigram LM (D = 0.75, add-one-smoothed
    // continuation) over the q270 10x replicated corpus — the
    // discounting family's classic member, one rung above add-k (q270)
    // and JM interpolation (q267). Round-16 addition under the
    // substantive-oracle policy (2.23 s measured before building).
    "q271_docnll_kn" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 9).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      CorpusStats.docNllKneserNey(
          parallel(reps.reduce(_ unionByName _)), "text", "doc_id",
          holdoutMod = 10, discount = 0.75)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),


    // TRIGRAM interpolated Kneser-Ney (D = 0.75, continuation counts
    // from the trigram type set per Chen & Goodman, add-one-smoothed
    // unigram continuation floor) over the q266/q267 5x replicated
    // corpus — the discount family completed at the order production
    // n-gram LMs shipped. Round-17 addition under the
    // substantive-oracle policy (oracle pre-timed before building;
    // fresh-key 1x/5x/25x rows land in BASELINE.md the same round).
    "q275_docnll_kn3" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 4).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      CorpusStats.docNllKneserNey3(
          parallel(reps.reduce(_ unionByName _)), "text", "doc_id",
          holdoutMod = 10, discount = 0.75)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),


    // Cross-version NLL drift: the q270 model (trained once on v1's
    // train split) replayed over v1's held docs AND a v2 whose held
    // docs have token 10 replaced (the q262 edit) — the
    // quality-regression gate for corpus edits, pairing with q262's
    // fingerprint-surface stability. Round-16 addition under the
    // substantive-oracle policy (1.83 s at 10x measured before
    // building; widened to 15x same round after in-window oracle draws
    // of ~1.1 s left the ratio one bad draw from the letter line —
    // 1.66 s re-timed at 15x).
    "q273_docnll_drift" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
      val reps = (0 to 14).map { r =>
        if (r == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + r * 1000000L).as("doc_id"),
          array_join(transform(
            graft.functions.TextFunctions.tokens(col("text")),
            x => concat(x, lit(s"_$r"))), " ").as("text"))
      }
      val v1 = parallel(reps.reduce(_ unionByName _))
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val v2 = v1.withColumn("text",
        when(col("doc_id") % 10 === 0 && size(toks) >= 10,
          array_join(concat(slice(toks, 1, 9), array(lit("EDITv2")),
            slice(toks, lit(11), greatest(size(toks) - 10, lit(0)))), " "))
          .otherwise(col("text")))
      CorpusStats.docNllDrift(v1, v2, "text", "doc_id",
          holdoutMod = 10, k = 1.0)
        .filter(col("doc_id") < 1000000L)
        .transform(ordered1(_, col("doc_id")))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // Mirrors CorpusStats.docNllBackoff over the q266 replicated
    // corpus: trigram c3/c2p, bigram alpha*cb/cu, add-1 unigram floor
    // (alpha written 0.4*0.4, the same IEEE product Scala's
    // alpha*alpha computes — a 0.16 literal is one ulp off).
    "q266_docnll_backoff" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS r)
        |  WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, doc_id % 10 = 0 AS held,
        |    string_split(text, ' ') AS t
        |  FROM corpus),
        |tri AS (SELECT held, CASE WHEN held THEN doc_id END AS id,
        |    g[1] AS w1, g[2] AS w2, g[3] AS w3, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT held, doc_id, unnest([t[i:i+2]
        |      FOR i IN generate_series(1, greatest(len(t)-2, 1))]) AS g
        |    FROM toks)
        |  WHERE len(g) = 3
        |  GROUP BY ALL),
        |c3 AS (SELECT w1, w2, w3, sum(n) AS c3 FROM tri WHERE NOT held
        |  GROUP BY w1, w2, w3),
        |c2p AS (SELECT w1, w2, sum(c3) AS c2p FROM c3 GROUP BY w1, w2),
        |bi AS (SELECT g[1] AS w1, g[2] AS w2, CAST(count(*) AS BIGINT) AS cb
        |  FROM (SELECT unnest([t[i:i+1]
        |      FOR i IN generate_series(1, greatest(len(t)-1, 1))]) AS g
        |    FROM toks WHERE NOT held)
        |  WHERE len(g) = 2
        |  GROUP BY 1, 2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM bi GROUP BY w1),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
        |  FROM (SELECT unnest(t) AS w FROM toks WHERE NOT held) GROUP BY w),
        |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS tn,
        |  CAST(count(*) AS DOUBLE) AS tv FROM uni),
        |sc AS (SELECT tri.id, tri.n,
        |    CASE WHEN c3.c3 IS NOT NULL THEN 0 ELSE 1 END AS bo,
        |    CASE WHEN c3.c3 IS NOT NULL
        |        THEN -ln(CAST(c3.c3 AS DOUBLE) / CAST(c2p.c2p AS DOUBLE))
        |      WHEN bi.cb IS NOT NULL
        |        THEN -ln(0.4 * CAST(bi.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE))
        |      ELSE -ln((0.4 * 0.4) * (CAST(coalesce(uni.c1, 0) AS DOUBLE) + 1.0)
        |        / (tot.tn + 1.0 * tot.tv)) END AS nll
        |  FROM tri
        |  LEFT JOIN c3 ON tri.w1 = c3.w1 AND tri.w2 = c3.w2 AND tri.w3 = c3.w3
        |  LEFT JOIN c2p ON tri.w1 = c2p.w1 AND tri.w2 = c2p.w2
        |  LEFT JOIN bi ON tri.w2 = bi.w1 AND tri.w3 = bi.w2
        |  LEFT JOIN cu ON tri.w2 = cu.w1
        |  LEFT JOIN uni ON tri.w3 = uni.w
        |  CROSS JOIN tot
        |  WHERE tri.held)
        |SELECT id AS doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
        |  CAST(sum(bo * n) AS BIGINT) AS n_backoff,
        |  round(sum(nll * n) / sum(n), 6) AS avg_nll,
        |  round(CAST(sum(bo * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
        |    AS backoff_share
        |FROM sc WHERE id < 1000000
        |GROUP BY id ORDER BY id""".stripMargin,


    // Mirrors CorpusStats.docNllInterpolated over the q266/q267
    // replicated corpus: the mixture written in the operator's exact
    // literal order (0.7·coalesce(c3/c2p,0) + 0.2·coalesce(cb/cu,0) +
    // 0.1·add-1 unigram), all divisions in DOUBLE.
    "q267_docnll_jm" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS r)
        |  WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, doc_id % 10 = 0 AS held,
        |    string_split(text, ' ') AS t
        |  FROM corpus),
        |tri AS (SELECT held, CASE WHEN held THEN doc_id END AS id,
        |    g[1] AS w1, g[2] AS w2, g[3] AS w3, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT held, doc_id, unnest([t[i:i+2]
        |      FOR i IN generate_series(1, greatest(len(t)-2, 1))]) AS g
        |    FROM toks)
        |  WHERE len(g) = 3
        |  GROUP BY ALL),
        |c3 AS (SELECT w1, w2, w3, sum(n) AS c3 FROM tri WHERE NOT held
        |  GROUP BY w1, w2, w3),
        |c2p AS (SELECT w1, w2, sum(c3) AS c2p FROM c3 GROUP BY w1, w2),
        |bi AS (SELECT g[1] AS w1, g[2] AS w2, CAST(count(*) AS BIGINT) AS cb
        |  FROM (SELECT unnest([t[i:i+1]
        |      FOR i IN generate_series(1, greatest(len(t)-1, 1))]) AS g
        |    FROM toks WHERE NOT held)
        |  WHERE len(g) = 2
        |  GROUP BY 1, 2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM bi GROUP BY w1),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
        |  FROM (SELECT unnest(t) AS w FROM toks WHERE NOT held) GROUP BY w),
        |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS tn,
        |  CAST(count(*) AS DOUBLE) AS tv FROM uni),
        |sc AS (SELECT tri.id, tri.n,
        |    CASE WHEN c3.c3 IS NOT NULL THEN 1 ELSE 0 END AS h3,
        |    -ln(0.7 * coalesce(CAST(c3.c3 AS DOUBLE) / CAST(c2p.c2p AS DOUBLE), 0.0)
        |      + 0.2 * coalesce(CAST(bi.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE), 0.0)
        |      + 0.1 * ((CAST(coalesce(uni.c1, 0) AS DOUBLE) + 1.0)
        |        / (tot.tn + 1.0 * tot.tv))) AS nll
        |  FROM tri
        |  LEFT JOIN c3 ON tri.w1 = c3.w1 AND tri.w2 = c3.w2 AND tri.w3 = c3.w3
        |  LEFT JOIN c2p ON tri.w1 = c2p.w1 AND tri.w2 = c2p.w2
        |  LEFT JOIN bi ON tri.w2 = bi.w1 AND tri.w3 = bi.w2
        |  LEFT JOIN cu ON tri.w2 = cu.w1
        |  LEFT JOIN uni ON tri.w3 = uni.w
        |  CROSS JOIN tot
        |  WHERE tri.held)
        |SELECT id AS doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
        |  CAST(sum(h3 * n) AS BIGINT) AS n_hits3,
        |  round(sum(nll * n) / sum(n), 6) AS avg_nll,
        |  round(CAST(sum(h3 * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
        |    AS hit3_share
        |FROM sc WHERE id < 1000000
        |GROUP BY id ORDER BY doc_id""".stripMargin,


    // Mirrors CorpusStats.docNll over the q270 10x replicated corpus:
    // the q198 add-1 bigram arithmetic re-keyed per held doc; the
    // vocabulary rides the same padded type-table discipline on the
    // Spark side but the oracle spells it as a plain DISTINCT.
    "q270_docnll" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r)
        |  WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, doc_id % 10 = 0 AS held, string_split(text, ' ') AS t
        |  FROM corpus),
        |bg AS (SELECT doc_id, held, t[i] AS w1, t[i + 1] AS w2
        |  FROM d, unnest(range(1, len(t))) AS u(i)),
        |bt AS (SELECT held, CASE WHEN held THEN doc_id END AS id, w1, w2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM bg GROUP BY ALL),
        |cb AS (SELECT w1, w2, sum(n) AS cb FROM bt WHERE NOT held
        |  GROUP BY w1, w2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(t) AS w FROM d WHERE NOT held)),
        |sc AS (SELECT bt.id, bt.n,
        |    -ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(cu.cu, 0) AS DOUBLE) +
        |        1.0 * CAST(v.v AS DOUBLE))) AS nll
        |  FROM bt LEFT JOIN cb ON cb.w1 = bt.w1 AND cb.w2 = bt.w2
        |  LEFT JOIN cu ON cu.w1 = bt.w1
        |  CROSS JOIN v
        |  WHERE bt.held)
        |SELECT id AS doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  round(sum(nll * CAST(n AS DOUBLE)) / CAST(sum(n) AS DOUBLE), 6)
        |    AS avg_nll
        |FROM sc WHERE id < 1000000
        |GROUP BY id ORDER BY doc_id""".stripMargin,


    // Mirrors CorpusStats.docNllKneserNey over the q270 replicated
    // corpus: D written 0.75 literal on both sides; the continuation
    // probability appears as the SAME IEEE expression in both CASE
    // branches; counts (cb, cu, n1l, n1r, T, V) all integer-exact.
    "q271_docnll_kn" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS r)
        |  WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, doc_id % 10 = 0 AS held, string_split(text, ' ') AS t
        |  FROM corpus),
        |bg AS (SELECT doc_id, held, t[i] AS w1, t[i + 1] AS w2
        |  FROM d, unnest(range(1, len(t))) AS u(i)),
        |bt AS (SELECT held, CASE WHEN held THEN doc_id END AS id, w1, w2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM bg GROUP BY ALL),
        |cb AS (SELECT w1, w2, sum(n) AS cb FROM bt WHERE NOT held
        |  GROUP BY w1, w2),
        |cun AS (SELECT w1, sum(cb) AS cu, count(*) AS n1l FROM cb GROUP BY w1),
        |n1r AS (SELECT w2, count(*) AS n1r FROM cb GROUP BY w2),
        |tt AS (SELECT count(*) AS t FROM cb),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(t) AS w FROM d WHERE NOT held)),
        |sc AS (SELECT bt.id, bt.n,
        |    -ln(CASE WHEN cun.cu IS NULL THEN
        |        ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |          (CAST(tt.t AS DOUBLE) + CAST(v.v AS DOUBLE)))
        |      ELSE (greatest(CAST(coalesce(cb.cb, 0) AS DOUBLE) - 0.75, 0.0) +
        |        0.75 * CAST(cun.n1l AS DOUBLE) *
        |        ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |          (CAST(tt.t AS DOUBLE) + CAST(v.v AS DOUBLE)))) /
        |        CAST(cun.cu AS DOUBLE)
        |      END) AS nll
        |  FROM bt LEFT JOIN cb ON cb.w1 = bt.w1 AND cb.w2 = bt.w2
        |  LEFT JOIN cun ON cun.w1 = bt.w1
        |  LEFT JOIN n1r ON n1r.w2 = bt.w2
        |  CROSS JOIN tt CROSS JOIN v
        |  WHERE bt.held)
        |SELECT id AS doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  round(sum(nll * CAST(n AS DOUBLE)) / CAST(sum(n) AS DOUBLE), 6)
        |    AS avg_nll
        |FROM sc WHERE id < 1000000
        |GROUP BY id ORDER BY doc_id""".stripMargin,


    // Mirrors CorpusStats.docNllKneserNey3 over the 5x replicated
    // corpus: D written 0.75 literal on both sides; the BIGRAM-level
    // KN probability (itself a CASE on the continuation tables)
    // appears as the SAME IEEE expression in both branches of the
    // trigram CASE — the q271 rule, one order up; every lower-order
    // statistic is a continuation count derived from the c3 type set.
    "q275_docnll_kn3" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS r)
        |  WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, doc_id % 10 = 0 AS held,
        |    string_split(text, ' ') AS t
        |  FROM corpus),
        |tri AS (SELECT held, CASE WHEN held THEN doc_id END AS id,
        |    g[1] AS w1, g[2] AS w2, g[3] AS w3, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT held, doc_id, unnest([t[i:i+2]
        |      FOR i IN generate_series(1, greatest(len(t)-2, 1))]) AS g
        |    FROM toks)
        |  WHERE len(g) = 3
        |  GROUP BY ALL),
        |c3 AS (SELECT w1, w2, w3, sum(n) AS c3 FROM tri WHERE NOT held
        |  GROUP BY w1, w2, w3),
        |c2h AS (SELECT w1, w2, sum(c3) AS c2p, count(*) AS n1h
        |  FROM c3 GROUP BY w1, w2),
        |cc AS (SELECT w2, w3, count(*) AS cc FROM c3 GROUP BY w2, w3),
        |ccu AS (SELECT w2, sum(cc) AS ccu, count(*) AS n1m
        |  FROM cc GROUP BY w2),
        |n1r AS (SELECT w3, count(*) AS n1r FROM cc GROUP BY w3),
        |tv AS (SELECT count(*) AS t, count(DISTINCT w3) AS v FROM cc),
        |sc AS (SELECT tri.id, tri.n,
        |    CASE WHEN c2h.c2p IS NOT NULL THEN 1 ELSE 0 END AS h,
        |    -ln(CASE WHEN c2h.c2p IS NULL THEN
        |        CASE WHEN ccu.ccu IS NULL THEN
        |            ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |              (CAST(tv.t AS DOUBLE) + CAST(tv.v AS DOUBLE)))
        |          ELSE (greatest(CAST(coalesce(cc.cc, 0) AS DOUBLE) - 0.75,
        |              0.0) +
        |            0.75 * CAST(ccu.n1m AS DOUBLE) *
        |            ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |              (CAST(tv.t AS DOUBLE) + CAST(tv.v AS DOUBLE)))) /
        |            CAST(ccu.ccu AS DOUBLE)
        |          END
        |      ELSE (greatest(CAST(coalesce(c3.c3, 0) AS DOUBLE) - 0.75,
        |          0.0) +
        |        0.75 * CAST(c2h.n1h AS DOUBLE) *
        |        CASE WHEN ccu.ccu IS NULL THEN
        |            ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |              (CAST(tv.t AS DOUBLE) + CAST(tv.v AS DOUBLE)))
        |          ELSE (greatest(CAST(coalesce(cc.cc, 0) AS DOUBLE) - 0.75,
        |              0.0) +
        |            0.75 * CAST(ccu.n1m AS DOUBLE) *
        |            ((CAST(coalesce(n1r.n1r, 0) AS DOUBLE) + 1.0) /
        |              (CAST(tv.t AS DOUBLE) + CAST(tv.v AS DOUBLE)))) /
        |            CAST(ccu.ccu AS DOUBLE)
        |          END) /
        |        CAST(c2h.c2p AS DOUBLE)
        |      END) AS nll
        |  FROM tri
        |  LEFT JOIN c3 ON tri.w1 = c3.w1 AND tri.w2 = c3.w2 AND tri.w3 = c3.w3
        |  LEFT JOIN c2h ON tri.w1 = c2h.w1 AND tri.w2 = c2h.w2
        |  LEFT JOIN cc ON tri.w2 = cc.w2 AND tri.w3 = cc.w3
        |  LEFT JOIN ccu ON tri.w2 = ccu.w2
        |  LEFT JOIN n1r ON tri.w3 = n1r.w3
        |  CROSS JOIN tv
        |  WHERE tri.held)
        |SELECT id AS doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
        |  CAST(sum(h * n) AS BIGINT) AS n_ctx_hits,
        |  round(sum(nll * CAST(n AS DOUBLE)) / CAST(sum(n) AS DOUBLE), 6)
        |    AS avg_nll,
        |  round(CAST(sum(h * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
        |    AS ctx_hit_share
        |FROM sc WHERE id < 1000000
        |GROUP BY id ORDER BY doc_id""".stripMargin,


    // Mirrors CorpusStats.docNllDrift: one model (v1 train split), two
    // scoring branches (v1 held, q262-edited v2 held); drift subtracts
    // the already-rounded per-version scores then rounds again.
    "q273_docnll_drift" ->
      """WITH corpus AS (
        |  SELECT doc_id + r * 1000000 AS doc_id,
        |    CASE WHEN r = 0 THEN text
        |      ELSE array_to_string([x || '_' || r
        |        FOR x IN string_split(text, ' ')], ' ') END AS text
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS r)
        |  WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, doc_id % 10 = 0 AS held, string_split(text, ' ') AS t
        |  FROM corpus),
        |d2 AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 10
        |      THEN list_concat(list_concat(t[1:9], ['EDITv2']), t[11:len(t)])
        |      ELSE t END AS t
        |  FROM d WHERE held),
        |bg AS (SELECT doc_id, held, t[i] AS w1, t[i + 1] AS w2
        |  FROM d, unnest(range(1, len(t))) AS u(i)),
        |bt AS (SELECT held, CASE WHEN held THEN doc_id END AS id, w1, w2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM bg GROUP BY ALL),
        |bt2 AS (SELECT doc_id AS id, t[i] AS w1, t[i + 1] AS w2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM d2, unnest(range(1, len(t))) AS u(i) GROUP BY ALL),
        |cb AS (SELECT w1, w2, sum(n) AS cb FROM bt WHERE NOT held
        |  GROUP BY w1, w2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(t) AS w FROM d WHERE NOT held)),
        |s1 AS (SELECT bt.id, CAST(sum(bt.n) AS BIGINT) AS n_bigrams_v1,
        |    round(sum(-ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(cu.cu, 0) AS DOUBLE) + 1.0 * CAST(v.v AS DOUBLE)))
        |      * CAST(bt.n AS DOUBLE)) / CAST(sum(bt.n) AS DOUBLE), 6)
        |      AS avg_nll_v1
        |  FROM bt LEFT JOIN cb ON cb.w1 = bt.w1 AND cb.w2 = bt.w2
        |  LEFT JOIN cu ON cu.w1 = bt.w1
        |  CROSS JOIN v WHERE bt.held GROUP BY bt.id),
        |s2 AS (SELECT bt2.id, CAST(sum(bt2.n) AS BIGINT) AS n_bigrams_v2,
        |    round(sum(-ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(cu.cu, 0) AS DOUBLE) + 1.0 * CAST(v.v AS DOUBLE)))
        |      * CAST(bt2.n AS DOUBLE)) / CAST(sum(bt2.n) AS DOUBLE), 6)
        |      AS avg_nll_v2
        |  FROM bt2 LEFT JOIN cb ON cb.w1 = bt2.w1 AND cb.w2 = bt2.w2
        |  LEFT JOIN cu ON cu.w1 = bt2.w1
        |  CROSS JOIN v GROUP BY bt2.id)
        |SELECT s1.id AS doc_id, n_bigrams_v1, n_bigrams_v2,
        |  avg_nll_v1, avg_nll_v2,
        |  round(avg_nll_v2 - avg_nll_v1, 6) AS drift
        |FROM s1 JOIN s2 ON s1.id = s2.id
        |WHERE s1.id < 1000000 ORDER BY doc_id""".stripMargin,


    "q260_vocab_fertility" ->
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |ty AS (SELECT source, w, count(*) AS c FROM w GROUP BY source, w),
        |c AS (SELECT w, sum(c) AS c FROM ty GROUP BY w),
        |v AS (SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS r
        |  FROM c QUALIFY r <= 5000),
        |j AS (SELECT source, ty.w AS w, ty.c AS c, v.r AS r,
        |    CAST(greatest(length(ty.w), 1) AS BIGINT) AS sh,
        |    CAST(length(ty.w) AS BIGINT) AS l
        |  FROM ty LEFT JOIN v ON ty.w = v.w),
        |sizes AS (SELECT unnest([100, 1000, 5000]) AS vs)
        |SELECT CAST(vs AS BIGINT) AS vocab_size, source,
        |  CAST(sum(c) AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN r IS NOT NULL AND r <= vs THEN 0 ELSE c END)
        |    AS BIGINT) AS n_oov_words,
        |  CAST(sum(CASE WHEN r IS NOT NULL AND r <= vs THEN c ELSE sh * c
        |    END) AS BIGINT) AS n_units,
        |  CAST(sum(l * c) AS BIGINT) AS n_chars,
        |  round(CAST(sum(CASE WHEN r IS NOT NULL AND r <= vs
        |        THEN c ELSE sh * c END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS fertility,
        |  round(CAST(sum(CASE WHEN r IS NOT NULL AND r <= vs
        |        THEN 0 ELSE c END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS oov_share,
        |  round(CAST(sum(l * c) AS DOUBLE)
        |    / CAST(sum(CASE WHEN r IS NOT NULL AND r <= vs
        |        THEN c ELSE sh * c END) AS DOUBLE), 6) AS compression
        |FROM j CROSS JOIN sizes
        |GROUP BY vs, source ORDER BY vocab_size, source""".stripMargin,


    "q22_text_stats" ->
      """SELECT doc_id, n_chars,
        | CAST(length(text) AS BIGINT) AS text_len,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q23_text_quality" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '),
        |   x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q51_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  [array_to_string(t[i:i+1], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 1, 1))] AS s
        |  FROM toks)
        |SELECT doc_id,
        | CAST(greatest(list_max([len(list_filter(s, y -> y = x))
        |   FOR x IN list_distinct(s)]), 1) AS DOUBLE)
        |   / CAST(len(s) AS DOUBLE) AS top_bigram_frac,
        | CAST(len(list_distinct(s)) AS DOUBLE)
        |   / CAST(len(s) AS DOUBLE) AS distinct_bigram_ratio
        |FROM sh ORDER BY doc_id""".stripMargin,


    "q52_pii_scrub" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(
        |   text || ' contact user' || doc_id || '@example.com or 555-'
        |        || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-4242',
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q53_vocab" ->
      """SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token HAVING COUNT(*) >= 5
        |ORDER BY n DESC, token LIMIT 100""".stripMargin,


    "q70_quality_filter" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
        |  CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |    / CAST(len(t) AS DOUBLE) AS stopword_ratio
        |  FROM toks),
        |sh AS (SELECT doc_id, [array_to_string(t[i:i+1], ' ')
        |  FOR i IN generate_series(1, greatest(len(t) - 1, 1))] AS s FROM toks),
        |rep AS (SELECT doc_id,
        |  CAST(greatest(list_max([len(list_filter(s, y -> y = x)) FOR x IN list_distinct(s)]), 1) AS DOUBLE)
        |    / CAST(len(s) AS DOUBLE) AS top_bigram_frac FROM sh),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS v FROM freq),
        |rare AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < tt THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_frac
        |  FROM tk JOIN freq USING (token) CROSS JOIN tot GROUP BY doc_id)
        |SELECT doc_id, n_tokens, ttr, stopword_ratio, top_bigram_frac, rare_frac,
        |  (n_tokens >= 30 AND ttr >= 0.35 AND stopword_ratio >= 0.03
        |   AND top_bigram_frac < 0.08 AND rare_frac <= 0.5) AS keep
        |FROM base JOIN rep USING (doc_id) JOIN rare USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    "q68_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < t THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        | CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < t THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_frac,
        | min(c) AS min_cf, max(c) AS max_cf
        |FROM toks JOIN freq USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q78_corpus_report" ->
      """WITH dc AS (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1),
        |e AS (SELECT source, lang,
        |  len(string_split(text, ' ')) AS nt,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sw,
        |  CASE WHEN n > 1 THEN 1 ELSE 0 END AS dup
        |  FROM documents JOIN dc ON md5(text) = h)
        |SELECT source, lang, count(*) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens,
        | round(avg(ttr), 6) AS mean_ttr,
        | round(avg(sw), 6) AS mean_stopword_ratio,
        | round(CAST(sum(dup) AS DOUBLE) / count(*), 6) AS dup_frac
        |FROM e GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,


    "q74_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
        | round(log2(CAST(sum(k) AS DOUBLE))
        |   - sum(k * log2(CAST(k AS DOUBLE))) / CAST(sum(k) AS DOUBLE), 6) AS entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q79_lm_quality" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(avg(ln(c + 0.5) - ln(t + 0.5 * v)), 6) AS lm_logprob
        |FROM toks JOIN freq USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q81_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, token, tf,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tf_idf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |ranked AS (SELECT doc_id, token, tf, tf_idf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, token) AS rnk
        |  FROM scored)
        |SELECT doc_id, CAST(rnk AS INT) AS rank, token, tf, tf_idf
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,


    "q88_collocations" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM d)),
        |bgc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS u,
        |               (SELECT CAST(sum(n_pair) AS BIGINT) FROM bgc) AS b)
        |SELECT w1, w2, n_pair,
        |  round(ln((CAST(n_pair AS DOUBLE) / b) /
        |    ((CAST(c1.c AS DOUBLE) / u) * (CAST(c2.c AS DOUBLE) / u))), 6) AS pmi
        |FROM bgc JOIN uni c1 ON bgc.w1 = c1.token JOIN uni c2 ON bgc.w2 = c2.token
        |CROSS JOIN tot
        |ORDER BY n_pair DESC, w1, w2 LIMIT 50""".stripMargin,


    "q90_length_deciles" ->
      """WITH lens AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt, doc_id FROM documents),
        |ranked AS (SELECT source, nt,
        |  row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY source) AS n FROM lens)
        |SELECT source, count(*) AS n_docs,
        |  max(CASE WHEN rn = ceil(n * 1 / 10.0) THEN nt END) AS p10,
        |  max(CASE WHEN rn = ceil(n * 2 / 10.0) THEN nt END) AS p20,
        |  max(CASE WHEN rn = ceil(n * 3 / 10.0) THEN nt END) AS p30,
        |  max(CASE WHEN rn = ceil(n * 4 / 10.0) THEN nt END) AS p40,
        |  max(CASE WHEN rn = ceil(n * 5 / 10.0) THEN nt END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 6 / 10.0) THEN nt END) AS p60,
        |  max(CASE WHEN rn = ceil(n * 7 / 10.0) THEN nt END) AS p70,
        |  max(CASE WHEN rn = ceil(n * 8 / 10.0) THEN nt END) AS p80,
        |  max(CASE WHEN rn = ceil(n * 9 / 10.0) THEN nt END) AS p90
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,


    "q97_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, md5(g) AS h FROM (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+2], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 2, 1))])) AS g FROM d)),
        |first AS (SELECT h, min(doc_id) AS fst FROM grams GROUP BY h)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN g.doc_id = f.fst THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN g.doc_id = f.fst THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty_ratio
        |FROM grams g JOIN first f ON g.h = f.h
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,


    "q98_length_outliers" ->
      """WITH lens AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt, doc_id FROM documents),
        |r1 AS (SELECT source, nt, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM lens),
        |med AS (SELECT source, nt AS med FROM r1 WHERE rn = ceil(n / 2.0)),
        |dev AS (SELECT l.source, abs(l.nt - m.med) AS ad, l.doc_id, m.med
        |  FROM lens l JOIN med m USING (source)),
        |r2 AS (SELECT source, ad, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY ad, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM dev),
        |mad AS (SELECT source, ad AS mad FROM r2 WHERE rn = ceil(n / 2.0))
        |SELECT d.source, count(*) AS n_docs, max(d.med) AS median_tokens,
        |  max(md.mad) AS mad_tokens,
        |  CAST(sum(CASE WHEN d.ad > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad md USING (source)
        |GROUP BY d.source ORDER BY source""".stripMargin,


    "q103_source_divergence" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |ns AS (SELECT source, sum(c) AS ns FROM c GROUP BY 1),
        |nw AS (SELECT token, sum(c) AS nw FROM c GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM c)
        |SELECT c.source, CAST(max(ns.ns) AS BIGINT) AS n_tokens,
        |  count(*) AS n_vocab,
        |  round(sum((CAST(c.c AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |    * ln((CAST(c.c AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |        / (CAST(nw.nw AS DOUBLE) / CAST(n.n AS DOUBLE)))), 6) AS kl_nats
        |FROM c JOIN ns USING (source) JOIN nw USING (token) CROSS JOIN n
        |GROUP BY c.source ORDER BY c.source""".stripMargin,


    "q105_oov_rate" ->
      """WITH c AS (
        |  SELECT source, token, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY source, token),
        |nw AS (SELECT token, sum(c) AS nw FROM c GROUP BY token)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN nw < 5 THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(sum(CASE WHEN nw < 5 THEN 1 ELSE 0 END) AS BIGINT) AS oov_types,
        |  round(CAST(sum(CASE WHEN nw < 5 THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS oov_rate
        |FROM c JOIN nw USING (token)
        |GROUP BY source ORDER BY source""".stripMargin,


    "q108_gopher_rules" ->
      """WITH f AS (SELECT source,
        |  len(string_split(text, ' ')) BETWEEN 20 AND 80 AS rw,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE)
        |    BETWEEN 3.0 AND 4.5 AS rm,
        |  len(list_distinct(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','an','of','and','or','to','in','is','on')))) >= 2 AS rs
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rw THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_words,
        |  CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_meanlen,
        |  CAST(sum(CASE WHEN rs THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stopwords,
        |  CAST(sum(CASE WHEN rw AND rm AND rs THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
        |  round(CAST(sum(CASE WHEN rw AND rm AND rs THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS pass_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,


    "q110_zipf_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |hist AS (SELECT c, count(*) AS nt FROM c GROUP BY c),
        |w AS (SELECT c, nt,
        |  sum(c * nt) OVER (ORDER BY c DESC) AS cumtok,
        |  sum(nt) OVER (ORDER BY c DESC) AS cumtyp FROM hist),
        |tot AS (SELECT sum(c * nt) AS tt, sum(nt) AS ty FROM hist),
        |th AS (SELECT unnest([500000, 900000, 990000]) AS ppm),
        |cand AS (SELECT ppm, c, nt, cumtok, cumtyp, tt, ty,
        |    (tt * ppm + 999999) // 1000000 AS target,
        |    row_number() OVER (PARTITION BY ppm ORDER BY cumtyp) AS rn
        |  FROM th CROSS JOIN w CROSS JOIN tot
        |  WHERE cumtok >= (tt * ppm + 999999) // 1000000)
        |SELECT CAST(ppm AS BIGINT) AS threshold_ppm,
        |  CAST(target AS BIGINT) AS target_tokens,
        |  CAST(cumtyp - nt
        |    + (target - (cumtok - c * nt) + c - 1) // c AS BIGINT) AS n_types,
        |  CAST(ty AS BIGINT) AS total_types,
        |  CAST(tt AS BIGINT) AS total_tokens
        |FROM cand WHERE rn = 1 ORDER BY threshold_ppm""".stripMargin,


    "q118_cooc_ppmi" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT unnest(flatten([[ [least(t[i], t[i+j]), greatest(t[i], t[i+j])]
        |    FOR i IN generate_series(1, len(t) - j)] FOR j IN generate_series(1, 3)])) AS pr
        |  FROM d),
        |pc AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n_pair
        |  FROM p GROUP BY 1, 2),
        |toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS u,
        |               (SELECT CAST(sum(n_pair) AS BIGINT) FROM pc) AS b),
        |top AS (SELECT * FROM pc ORDER BY n_pair DESC, w1, w2 LIMIT 50)
        |SELECT w1, w2, n_pair,
        |  round(greatest(0.0, ln((CAST(n_pair AS DOUBLE) / b) /
        |    ((CAST(c1.c AS DOUBLE) / u) * (CAST(c2.c AS DOUBLE) / u)))), 6) AS ppmi
        |FROM top JOIN uni c1 ON top.w1 = c1.w JOIN uni c2 ON top.w2 = c2.w
        |CROSS JOIN tot ORDER BY n_pair DESC, w1, w2""".stripMargin,


    "q120_nfc_audit" ->
      """WITH fx AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' cafe' || chr(769)
        |         ELSE text END AS text
        |  FROM documents),
        |n AS (SELECT source, text, nfc_normalize(text) AS nt FROM fx)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_denorm,
        |  CAST(sum(length(text) - length(nt)) AS BIGINT) AS chars_saved,
        |  round(CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS denorm_pct
        |FROM n GROUP BY source ORDER BY source""".stripMargin,


    "q46_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |grams AS (SELECT doc_id,
         |  list_distinct([substring(text, i, 3)
         |    FOR i IN generate_series(1, greatest(length(text) - 2, 1))]) AS g
         |  FROM documents)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |    / CAST(len(list_distinct(list_concat(ga.g, gb.g))) AS DOUBLE) AS jaccard
         |FROM pairs p
         |JOIN grams ga ON ga.doc_id = p.doc_id_a
         |JOIN grams gb ON gb.doc_id = p.doc_id_b
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,


    // Bigram construction via the 1-based position spine
    // range(1, len(t)); add-1 smoothing spelled with the same literal
    // arithmetic as the operator.
    "q198_bigram_nll" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2,
        |    doc_id % 7 = 0 AS held
        |  FROM d, unnest(range(1, len(t))) AS u(i)),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bg WHERE NOT held
        |  GROUP BY w1, w2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(t) AS w FROM d WHERE doc_id % 7 <> 0)),
        |ht AS (SELECT source, w1, w2, count(*) AS n FROM bg WHERE held
        |  GROUP BY source, w1, w2),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM bg
        |  WHERE held GROUP BY source),
        |sc AS (SELECT ht.source, ht.n,
        |    -ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(cu.cu, 0) AS DOUBLE) +
        |        1.0 * CAST(v.v AS DOUBLE))) AS nll
        |  FROM ht LEFT JOIN cb ON cb.w1 = ht.w1 AND cb.w2 = ht.w2
        |  LEFT JOIN cu ON cu.w1 = ht.w1
        |  CROSS JOIN v)
        |SELECT sc.source, nd.n_docs, CAST(sum(sc.n) AS BIGINT) AS n_bigrams,
        |  round(sum(sc.nll * CAST(sc.n AS DOUBLE)) /
        |    CAST(sum(sc.n) AS DOUBLE), 6) AS avg_nll
        |FROM sc JOIN nd ON nd.source = sc.source
        |GROUP BY sc.source, nd.n_docs
        |ORDER BY sc.source""".stripMargin,


    "q199_readability" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |    CAST(sum(greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
        |      AS BIGINT) AS n_sentences,
        |    CAST(sum(greatest(
        |      len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1))
        |      AS BIGINT) AS n_syllables
        |  FROM documents WHERE text IS NOT NULL GROUP BY source)
        |SELECT source, n_docs, n_words, n_sentences, n_syllables,
        |  round(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6)
        |    AS words_per_sentence,
        |  round(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        |    AS syllables_per_word,
        |  CASE WHEN n_words > 0 THEN round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) /
        |        CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) /
        |        CAST(n_words AS DOUBLE)), 6) END AS flesch
        |FROM a ORDER BY source""".stripMargin,


    // Integer count folds mirror CorpusStats.simpsonDiversity; the
    // three ratios divide once in IEEE.
    "q228_simpson_diversity" ->
      """WITH c AS (SELECT source AS grp, w, count(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS w
        |     FROM documents WHERE text IS NOT NULL)
        |  GROUP BY source, w),
        |g AS (SELECT grp, CAST(sum(c) AS HUGEINT) AS n,
        |    count(*) AS n_types,
        |    CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
        |      AS c2,
        |    max(c) AS mx
        |  FROM c GROUP BY grp)
        |SELECT grp AS "group", CAST(n AS BIGINT) AS n_tokens, n_types,
        |  round(CAST(c2 AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS simpson,
        |  round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) /
        |    CAST(c2 AS DOUBLE), 6) AS inv_simpson,
        |  round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS berger_parker
        |FROM g ORDER BY "group"""".stripMargin,


    // DuckDB's own jaro_winkler_similarity is the oracle — the exact
    // semantics (0.7 boost gate, prefix cap 4, empty -> 0) the codegen'd
    // expression reproduces.
    "q233_jaro_names" ->
      """WITH base AS (SELECT substring(c_name, 1, length(c_name) - 2)
        |    AS blk, c_custkey AS id, c_name AS name FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM base a JOIN base b USING (blk) WHERE a.id < b.id
        |ORDER BY jw DESC, id_a, id_b LIMIT 50""".stripMargin,


    // DuckDB's damerau_levenshtein IS the unrestricted variant the
    // expression implements (probed: CA/ABC=2, ab/ba=1) — integer
    // distances make the top-50 cut engine-exact.
    "q244_damerau_names" ->
      """WITH a AS (SELECT p_brand AS bk, p_size AS sk,
        |    p_partkey AS id_a, p_name AS name_a FROM part),
        |b AS (SELECT p_brand AS bk, p_size AS sk,
        |    p_partkey AS id_b, p_name AS name_b FROM part)
        |SELECT id_a, id_b,
        |  CAST(damerau_levenshtein(name_a, name_b) AS INT) AS dl
        |FROM a JOIN b USING (bk, sk)
        |WHERE id_a < id_b
        |ORDER BY dl ASC, id_a ASC, id_b ASC
        |LIMIT 50""".stripMargin,


    "q220_entropy_rate" ->
      """WITH c AS (SELECT source, w, count(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS w
        |     FROM documents WHERE text IS NOT NULL)
        |  GROUP BY source, w),
        |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c
        |  GROUP BY source)
        |SELECT c.source, max(n.n) AS n_tokens, count(*) AS n_types,
        |  round(sum(-(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))) /
        |    ln(2.0), 6) AS bits_per_token
        |FROM c JOIN n ON n.source = c.source
        |GROUP BY c.source ORDER BY c.source""".stripMargin,


    // Zero-filled (source, top-token) z profiles; zero-variance tokens
    // contribute 0; mean |z gap| per unordered pair.
    "q216_stylometry" ->
      """WITH st AS (SELECT source AS s, w, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  GROUP BY s, w),
        |top AS (SELECT w FROM (SELECT w, sum(c) AS cw FROM st GROUP BY w)
        |  ORDER BY cw DESC, w ASC LIMIT 50),
        |tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY s),
        |spine AS (SELECT tot.s, tot.n, top.w FROM tot CROSS JOIN top),
        |freq AS (SELECT spine.s, spine.w,
        |    CAST(coalesce(st.c, 0) AS DOUBLE) / CAST(spine.n AS DOUBLE)
        |      AS f
        |  FROM spine LEFT JOIN st ON st.s = spine.s AND st.w = spine.w),
        |z AS (SELECT s, w,
        |    CASE WHEN sd > 0 THEN (f - mu) / sd ELSE 0.0 END AS z
        |  FROM (SELECT s, w, f,
        |      avg(f) OVER (PARTITION BY w) AS mu,
        |      sqrt(avg(f * f) OVER (PARTITION BY w) -
        |        avg(f) OVER (PARTITION BY w) *
        |        avg(f) OVER (PARTITION BY w)) AS sd
        |    FROM freq))
        |SELECT a.s AS source_a, b.s AS source_b,
        |  count(*) AS n_tokens,
        |  round(sum(abs(a.z - b.z)) / CAST(count(*) AS DOUBLE), 6)
        |    AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.s < b.s
        |GROUP BY a.s, b.s ORDER BY source_a, source_b""".stripMargin,
  )
}
