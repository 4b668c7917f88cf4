package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables.{load, parallel}
import graft.functions.{BinaryFunctions, TextFunctions}
import graft.operators.Multimodal

/** Correctness queries for the multimodal-column and remaining
  * text-analysis operators (north-star scope). A deterministic media
  * fixture is synthesized from `documents`: each row becomes an opaque
  * binary payload with a real container magic block (rotating
  * jpeg/png/gif/pdf by doc_id % 4), 4-digit ASCII width/height fields,
  * and the document text as body — so the binary plumbing (concat,
  * slicing, hex, sniffing, codec batch loop) is exercised on real bytes
  * while DuckDB oracles recompute expected values from the construction.
  */
object MediaQueries {

  private val magics = Seq("FFD8FF00", "89504E47", "47494638", "25504446")
  private val fmtNames = Seq("jpeg", "png", "gif", "pdf")

  private def widthSql  = "100 + doc_id % 1820"
  private def heightSql = "100 + (doc_id * 7) % 980"

  /** The binary media fixture: magic(4) | width(4, ascii) | height(4,
    * ascii) | utf8(text). */
  private def withBin(docs: DataFrame): DataFrame = {
    val magic = magics.zipWithIndex.foldRight(lit(null).cast("binary")) {
      case ((hexStr, i), acc) =>
        when(col("doc_id") % 4 === i, unhex(lit(hexStr))).otherwise(acc)
    }
    val payload = concat(
      lpad(expr(widthSql).cast("string"), 4, "0"),
      lpad(expr(heightSql).cast("string"), 4, "0"),
      col("text")).cast("binary")
    docs.withColumn("bin", concat(magic, payload))
  }

  private val idLangs = Seq("en", "es", "de", "fr", "zh")

  /** Shared language-ID scoring frame (q36 + q106): tokenize once, then
    * one codegen'd hash-set probe pass per language over the materialized
    * array (CountInSet — the HOF filter form interprets tokens × markers
    * comparisons, and re-deriving split(text) per score would tokenize
    * ~20× per row across the score/greatest/CASE tree), plus the fixed-
    * priority argmax (en > es > de > fr > zh on ties) as `__pred`. */
  private def langScored(docs: DataFrame): DataFrame = {
    val toks = docs.withColumn("__toks", TextFunctions.tokens(col("text")))
    val scored = idLangs.foldLeft(toks) { (df, l) =>
      df.withColumn(s"s_$l",
        TextFunctions.countInSet(col("__toks"), TextFunctions.langMarkers(l)))
    }
    scored.withColumn("__pred",
      when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr"), col("s_zh")), "en")
        .when(col("s_es") >= greatest(col("s_de"), col("s_fr"), col("s_zh")), "es")
        .when(col("s_de") >= greatest(col("s_fr"), col("s_zh")), "de")
        .when(col("s_fr") >= col("s_zh"), "fr")
        .otherwise("zh"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary metadata via pure expressions: size, magic sniff,
    // fingerprint, transport chunk count — no decode, no shuffle.
    "q34_binary_meta" -> ((s, d) => {
      withBin(parallel(load(s, d, "documents")))
        .select(col("doc_id"),
          BinaryFunctions.sniffFormat(col("bin")).as("format"),
          BinaryFunctions.byteSize(col("bin")).cast("long").as("n_bytes"),
          BinaryFunctions.fingerprint(col("bin")).as("fp"),
          BinaryFunctions.chunkCount(col("bin"), 64).cast("long").as("n_chunks"))
        .transform(QuerySupport.ordered1(_, col("doc_id")))
    }),

    // The decode stage: typed mapPartitions batch loop with the stub
    // codec reading the embedded header dims.
    "q35_multimodal_decode" -> ((s, d) => {
      Multimodal.decodeMeta(withBin(parallel(load(s, d, "documents"))), "doc_id", "bin")
        .toDF()
        .select(col("doc_id"), col("format"),
          col("byte_size").cast("long").as("byte_size"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("aspect"))
        .transform(QuerySupport.ordered1(_, col("doc_id")))
    }),

    // Language-ID heuristic: marker hit counts per language + fixed-
    // priority argmax (en > es > de > fr > zh on ties).
    "q36_langid" -> ((s, d) => {
      val scored = langScored(parallel(load(s, d, "documents")))
      scored.select(col("doc_id") +: idLangs.map(l => col(s"s_$l")) :+
          col("__pred").as("lang"): _*)
        .transform(QuerySupport.ordered1(_, col("doc_id")))
    }),

    // Recorded-label vs heuristic-prediction confusion matrix over the
    // corpus's `lang` column — the label-quality audit for the language
    // metadata (the q104 panel's text-side sibling): a recorded language
    // whose rows keep predicting another language is a mislabeled slice
    // (or a heuristic blind spot), and share-within-recorded-lang reads
    // directly as that label's precision under the heuristic. One scan,
    // per-row codegen'd scoring, one reduction over ≤|langs|² cells; the
    // share window rides the tiny grouped frame.
    "q106_langid_confusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      langScored(parallel(load(s, d, "documents")))
        .groupBy(col("lang"), col("__pred").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share", round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(Window.partitionBy(col("lang")))
            .cast("double"), 6))
        .transform(QuerySupport.ordered1(_, col("lang"), col("pred_lang")))
    }),

    // Frame sampling: every 2nd 64-byte chunk per payload, one row per
    // frame (the video-frame-extraction plumbing shape).
    "q56_frame_sample" -> ((s, d) => {
      Multimodal.frameSample(withBin(parallel(load(s, d, "documents"))),
          "doc_id", "bin", frameBytes = 64, everyN = 2)
        .toDF()
        .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
          col("frame_hex"))
        .transform(QuerySupport.ordered1(_, col("doc_id"), col("frame_idx")))
    }),

    // Feature extraction: printable-class histogram of the payload body
    // (the embedding-extractor plumbing shape).
    "q57_media_features" -> ((s, d) => {
      Multimodal.featureExtract(withBin(parallel(load(s, d, "documents"))),
          "doc_id", "bin")
        .toDF()
        .select(col("doc_id"), col("body_len").cast("long").as("body_len"),
          col("n_lower").cast("long").as("n_lower"),
          col("n_upper").cast("long").as("n_upper"),
          col("n_digit").cast("long").as("n_digit"),
          col("n_other").cast("long").as("n_other"))
        .transform(QuerySupport.ordered1(_, col("doc_id")))
    }),

    // BPE-ish subword counting (tokenizer-cost signal).
    "q37_token_bpe" -> ((s, d) => {
      parallel(load(s, d, "documents"))
        .select(col("doc_id"),
          TextFunctions.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
        .transform(QuerySupport.ordered1(_, col("doc_id")))
    }))

  def oracleSql: Map[String, String] = {
    val fmtCase = "CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' " +
      "WHEN 2 THEN 'gif' ELSE 'pdf' END"
    val magicCase = magics.zipWithIndex
      .map { case (m, i) => s"WHEN $i THEN '$m'" }
      .mkString("CASE doc_id % 4 ", " ", " END")
    val payloadSql = s"lpad(CAST($widthSql AS STRING), 4, '0') || " +
      s"lpad(CAST($heightSql AS STRING), 4, '0') || text"
    val nBytesSql = s"12 + octet_length(encode(text))"

    Map(
      "q34_binary_meta" ->
        s"""SELECT doc_id,
           | $fmtCase AS format,
           | CAST($nBytesSql AS BIGINT) AS n_bytes,
           | md5($magicCase || hex(encode($payloadSql))) AS fp,
           | CAST(ceil(($nBytesSql) / 64.0) AS BIGINT) AS n_chunks
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q35_multimodal_decode" ->
        s"""SELECT doc_id,
           | $fmtCase AS format,
           | CAST($nBytesSql AS BIGINT) AS byte_size,
           | CAST($widthSql AS BIGINT) AS width,
           | CAST($heightSql AS BIGINT) AS height,
           | floor(($widthSql) * 1000000.0 / ($heightSql)) / 1000000.0 AS aspect
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q36_langid" -> {
        def score(l: String) = {
          val markers = TextFunctions.langMarkers(l).map(m => s"'$m'").mkString(", ")
          s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ($markers))) AS BIGINT)"
        }
        s"""SELECT doc_id,
           | ${score("en")} AS s_en, ${score("es")} AS s_es, ${score("de")} AS s_de,
           | ${score("fr")} AS s_fr, ${score("zh")} AS s_zh,
           | CASE WHEN ${score("en")} >= greatest(${score("es")}, ${score("de")}, ${score("fr")}, ${score("zh")}) THEN 'en'
           |      WHEN ${score("es")} >= greatest(${score("de")}, ${score("fr")}, ${score("zh")}) THEN 'es'
           |      WHEN ${score("de")} >= greatest(${score("fr")}, ${score("zh")}) THEN 'de'
           |      WHEN ${score("fr")} >= ${score("zh")} THEN 'fr'
           |      ELSE 'zh' END AS lang
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "q106_langid_confusion" -> {
        def score(l: String) = {
          val markers = TextFunctions.langMarkers(l).map(m => s"'$m'").mkString(", ")
          s"len(list_filter(string_split(text, ' '), x -> x IN ($markers)))"
        }
        s"""WITH p AS (SELECT lang,
           |  CASE WHEN ${score("en")} >= greatest(${score("es")}, ${score("de")}, ${score("fr")}, ${score("zh")}) THEN 'en'
           |       WHEN ${score("es")} >= greatest(${score("de")}, ${score("fr")}, ${score("zh")}) THEN 'es'
           |       WHEN ${score("de")} >= greatest(${score("fr")}, ${score("zh")}) THEN 'de'
           |       WHEN ${score("fr")} >= ${score("zh")} THEN 'fr'
           |       ELSE 'zh' END AS pred_lang
           |  FROM documents)
           |SELECT lang, pred_lang, count(*) AS n_docs,
           |  round(CAST(count(*) AS DOUBLE)
           |    / sum(count(*)) OVER (PARTITION BY lang), 6) AS share
           |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
      },

      "q56_frame_sample" ->
        s"""WITH p AS (
           |  SELECT doc_id,
           |    unhex($magicCase) || encode($payloadSql) AS payload
           |  FROM documents),
           |fr AS (
           |  SELECT doc_id, hex(payload) AS hx,
           |    unnest([k FOR k IN generate_series(0,
           |      CAST(ceil(octet_length(payload) / 64.0) AS INT) - 1)
           |      IF k % 2 = 0]) AS k
           |  FROM p)
           |SELECT doc_id, CAST(k AS INT) AS frame_idx,
           |  substring(hx, 1 + CAST(k AS INT) * 128, 128) AS frame_hex
           |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,

      "q57_media_features" ->
        s"""WITH b AS (SELECT doc_id, text AS body FROM documents)
           |SELECT doc_id,
           | CAST(length(body) AS BIGINT) AS body_len,
           | CAST(length(regexp_replace(body, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
           | CAST(length(regexp_replace(body, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
           | CAST(length(regexp_replace(body, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
           | CAST(length(regexp_replace(body, '[a-zA-Z0-9]', '', 'g')) AS BIGINT) AS n_other
           |FROM b ORDER BY doc_id""".stripMargin,

      "q37_token_bpe" ->
        """SELECT doc_id,
          | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
          |FROM documents ORDER BY doc_id""".stripMargin)
  }
}
