package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TopKByScoreAggregate
import graft.functions.TextFunctions._
import graft.operators.Multimodal

/**
 * Text-analysis operators over the `documents` table: token counting,
 * quality scoring, language-ID heuristic, content fingerprinting, plus the
 * multimodal metadata path. All hashes are portable integer arithmetic
 * (see [[graft.functions.TextFunctions]]), so every query here has a full
 * DuckDB oracle.
 */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-source deterministic k-sample of (source, doc_id, text) rows by
    * fingerprint order — shared by `sample_stratified` and the composed
    * `pipeline_curate`. Bounded TopKByScoreAggregate: ≤ k map-side state
    * per (source, task), no per-group window reducer. */
  private[queries] def sampleByFingerprint(d: DataFrame, k: Int): DataFrame =
    d.select(col("source"), col("doc_id"),
        fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(TopKByScoreAggregate
        .topK(-col("fp").cast("double"), col("doc_id"), k).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("r0", "e")))
      .select(col("source"), (col("r0") + 1).cast("int").as("rank"),
        col("e.neighbor_id").as("doc_id"),
        // fp < 2^30 << 2^53: the double round-trip is exact
        (-col("e.cos")).cast("long").as("fp"))

  // oracle fragment: polynomial char hash, mirrored from TextFunctions.
  // private[queries]: DedupQueries' oracles hash the same fingerprint —
  // ONE definition so the two oracle-side specs cannot drift (ADVICE r03).
  private[queries] def sqlPolyHash(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(c) AS BIGINT) for c in string_split($expr,'')]), " +
      s"(a,b)->(a*31+b)%1000000007)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace tokens, distinct types, and a BPE-ish
    // subword-regex count (the pre-merge token universe)
    "text_tokcount" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_words"),
        typeCount(col("text")).cast("long").as("n_types"),
        subwordCount(col("text")).cast("long").as("n_subwords"))
    }),

    // quality scoring: length stats, type-token ratio, mean word length
    "text_quality" -> ((s, dir) => {
      val w = words(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        (size(array_distinct(w)).cast("double") / size(w)).as("ttr"),
        ((col("n_chars") - size(w) + 1).cast("double") / size(w))
          .as("avg_word_len"),
        when(col("n_chars") >= 100 && size(w) >= 20, lit("good"))
          .otherwise(lit("low")).as("quality_class"))
    }),

    // GOPHER rule bundle (Rae et al. 2021, App. A) — the NAMED industry
    // per-document gate set next to the generic text_quality scores,
    // rolled up to per-source FAIL counts (the table a curation run
    // reads to decide which feed needs which filter):
    //   g1 word count ∈ [50, 100000]         g2 mean word len ∈ [3, 10]
    //   g3 symbol words ("#"/"...") ≤ 10%    g4 alphabetic words ≥ 80%
    //   g5 ≥ 2 distinct stopwords present
    // Every predicate is INTEGER arithmetic (e.g. g2 as 3·n_words ≤
    // n_letter_chars ≤ 10·n_words; ratio gates cross-multiplied), so
    // the oracle replays booleans exactly — no float thresholds. ONE
    // corpus scan of when-chain projections, |sources|-row aggregate.
    "quality_gopher" -> ((s, dir) => {
      val w = words(col("text"))
      val nWords = size(w).cast("long")
      val letters = (col("n_chars") - size(w) + 1).cast("long")
      val nSym = size(filter(w,
        x => x === "#" || x === "...")).cast("long")
      val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
      val nStop = size(array_intersect(array_distinct(w),
        typedLit(enStopwords))).cast("long")
      val f1 = nWords < 50L || nWords > 100000L
      val f2 = letters < lit(3L) * nWords || letters > lit(10L) * nWords
      val f3 = lit(10L) * nSym > nWords
      val f4 = lit(5L) * nAlpha < lit(4L) * nWords
      val f5 = nStop < 2L
      docs(s, dir)
        .select(col("source"), f1.as("f1"), f2.as("f2"), f3.as("f3"),
          f4.as("f4"), f5.as("f5"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f1").cast("long")).as("fail_wordcount"),
          sum(col("f2").cast("long")).as("fail_wordlen"),
          sum(col("f3").cast("long")).as("fail_symbol"),
          sum(col("f4").cast("long")).as("fail_alpha"),
          sum(col("f5").cast("long")).as("fail_stopword"),
          sum((col("f1") || col("f2") || col("f3") || col("f4")
            || col("f5")).cast("long")).as("fail_any"))
    }),

    // language-ID heuristic: stopword hit-ratio (n-gram heuristics reduce
    // to fixed token-set membership on this whitespace corpus)
    "text_langid" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        col("lang"),
        stopwordRatio(col("text")).as("stop_ratio"),
        when(stopwordRatio(col("text")) > 0.03, lit("en_like"))
          .otherwise(lit("other")).as("pred"))
    }),

    // LANGUAGE-GATE agreement matrix: the heuristic language ID rolled
    // up against the DECLARED lang metadata, per source — the audit a
    // language filter ships before anyone trusts it to route docs (a
    // feed whose declared-en docs read 'other' has either mislabeled
    // metadata or a gate blind spot; CCNet-style metadata-vs-classifier
    // cross-check). share = n / declared-lang total within the source.
    // ONE corpus scan to a |sources×langs×2| grid + a grid-sized window.
    "langid_confusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pred = when(stopwordRatio(col("text")) > 0.03, lit("en_like"))
        .otherwise(lit("other"))
      docs(s, dir)
        .select(col("source"), col("lang"), pred.as("pred"))
        .groupBy("source", "lang", "pred")
        .agg(count(lit(1)).as("n"))
        .withColumn("lang_n",
          sum(col("n")).over(Window.partitionBy(col("source"), col("lang"))))
        .select(col("source"), col("lang"), col("pred"), col("n"),
          (col("n").cast("double") / col("lang_n").cast("double"))
            .as("share"))
    }),

    // document fingerprint: rolling polynomial hash of the full text
    "text_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"))
    }),

    // BLOCKLIST phrase filter (the bad-phrase quality gate every crawl
    // pipeline runs): one row per (doc, matched phrase), substring
    // semantics. The phrase list is a broadcast dim — the corpus scans
    // once with |phrases| codegen'd contains predicates per row; at
    // thousands of phrases the same shape holds with the alternation
    // compiled into one automaton (single rlike), this per-phrase form
    // keeps WHICH phrase matched.
    "text_blocklist" -> ((s, dir) => {
      val phrases = Seq("table scan", "slow query", "hash join")
      val p = s.createDataFrame(phrases.map(Tuple1(_)))
        .toDF("phrase")
      docs(s, dir).select(col("doc_id"), col("text"))
        .join(broadcast(p), col("text").contains(col("phrase")))
        .select(col("doc_id"), col("phrase"))
    }),

    // Deterministic STRATIFIED sampling — per source, the k docs with the
    // smallest content fingerprint (a seedless pseudorandom order every
    // engine reproduces): the balanced-subsample op of a training-data
    // pipeline, built on the bounded TopKByScoreAggregate so map-side
    // state is ≤ k per (source, task) — no per-group window reducer.
    "sample_stratified" -> ((s, dir) =>
      sampleByFingerprint(docs(s, dir), 40)),

    // Repetition scoring (the Gopher-style quality signal): fraction of
    // words / 2-grams / 3-grams that are repeats within the document —
    // boilerplate and degenerate generations score high. Pure codegen'd
    // projection; n-gram lists keep duplicates (unlike the dedup path's
    // distinct shingle sets — repetition IS the signal here).
    "text_repetition" -> ((s, dir) => {
      // r06: counters from the fused RepStats kernel (one pass; the r05
      // projection re-split the text and re-built each n-gram array
      // twice — size + distinct-size). Fraction arithmetic reproduces
      // the r05 int->double promotions exactly.
      def dupFrac(d: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        when(n > 0, lit(1.0) - d.cast("double") / n).otherwise(lit(0.0))
      docs(s, dir)
        .select(col("doc_id"), graft.functions.RepStats(col("text")).as("rc"))
        .select(
          col("doc_id"),
          dupFrac(col("rc.dw"), col("rc.nw")).as("dup_word_frac"),
          dupFrac(col("rc.d2"), col("rc.n2")).as("dup_2gram_frac"),
          dupFrac(col("rc.d3"), col("rc.n3")).as("dup_3gram_frac"))
        // classify over the COMPUTED columns, not re-built copies of the
        // fraction trees — one definition to keep in sync with the oracle
        .withColumn("rep_class",
          when(col("dup_word_frac") > 0.6 || col("dup_3gram_frac") > 0.2,
            lit("repetitive")).otherwise(lit("ok")))
    }),

    // CORPUS-TRAINED frequency scoring (the CCNet-style LM-filter proxy,
    // Wenzek et al. 2020, made oracle-exact): train a top-K unigram
    // frequency table over the corpus, score each doc by how much of its
    // mass the common vocabulary covers — garbage/noise docs score near
    // zero, natural text high. Train = one vocab-bounded word groupBy
    // (map-side combined; top-K is driver-held like the IVF codebooks);
    // score = a pure projection against the literal map (zero scoring
    // shuffles — the 100 TB path). Integer numerators keep it
    // bit-portable: freq_hits is an exact int64 sum, the only float op is
    // one final division.
    "text_freq_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val wc = d.select(explode(words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .persist()
      val total = wc.agg(sum(col("c"))).head().getLong(0)
      val topk = wc.orderBy(col("c").desc, col("w").asc).limit(256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      wc.unpersist(blocking = false)
      val m = typedlit(topk)
      val w = words(col("text"))
      val hit = transform(w, x => coalesce(element_at(m, x), lit(0L)))
      d.select(
          col("doc_id"),
          size(w).cast("long").as("n_words"),
          aggregate(hit, lit(0L),
            (a, b) => a + when(b > 0, 1L).otherwise(0L))
            .as("known_words"),
          aggregate(hit, lit(0L), (a, b) => a + b).as("freq_hits"))
        .withColumn("freq_score",
          when(col("n_words") > 0,
            col("freq_hits").cast("double") /
              (col("n_words") * lit(total)).cast("double"))
            .otherwise(lit(0.0)))
    }),

    // multimodal metadata path: opaque binary payload + typed metadata
    // (decode itself is the stubbed FakeCodec; this query checks the
    // oracle-able part: byte length and mime routing)
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.mediaFromDocuments(docs(s, dir))
        .select(
          col("media_id"),
          col("mime"),
          length(col("payload")).cast("long").as("n_bytes"))
    })
  )

  private val stopList =
    enStopwords.map(w => s"'$w'").mkString("[", ",", "]")

  // oracle fragment: stopword hit-ratio, mirrored from
  // TextFunctions.stopwordRatio. private[queries]: QualityQueries' trained
  // classifier uses the same feature — ONE definition so the oracle-side
  // specs cannot drift.
  private[queries] val sqlStopRatio: String =
    s"""CAST(len(list_filter(string_split(text,' '),
          x -> list_contains($stopList, x))) AS DOUBLE)
          / len(string_split(text,' '))"""

  val oracles: Map[String, String] = Map(
    "text_tokcount" ->
      """SELECT doc_id,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_types,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))
           AS BIGINT) AS n_subwords
         FROM documents""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
           / len(string_split(text,' ')) AS ttr,
         CAST(n_chars - len(string_split(text,' ')) + 1 AS DOUBLE)
           / len(string_split(text,' ')) AS avg_word_len,
         CASE WHEN n_chars >= 100 AND len(string_split(text,' ')) >= 20
              THEN 'good' ELSE 'low' END AS quality_class
         FROM documents""",
    "quality_gopher" ->
      s"""WITH m AS (SELECT source,
             CAST(len(string_split(text,' ')) AS BIGINT) AS nw,
             CAST(n_chars - len(string_split(text,' ')) + 1 AS BIGINT)
               AS letters,
             CAST(len(list_filter(string_split(text,' '),
               x -> x = '#' OR x = '...')) AS BIGINT) AS nsym,
             CAST(len(list_filter(string_split(text,' '),
               x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS nalpha,
             CAST(len(list_intersect(list_distinct(string_split(text,' ')),
               [${graft.functions.TextFunctions.enStopwords
                   .map("'" + _ + "'").mkString(", ")}]))
               AS BIGINT) AS nstop
           FROM documents),
         f AS (SELECT source,
             (nw < 50 OR nw > 100000) AS f1,
             (letters < 3*nw OR letters > 10*nw) AS f2,
             (10*nsym > nw) AS f3,
             (5*nalpha < 4*nw) AS f4,
             (nstop < 2) AS f5
           FROM m)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_wordcount,
           CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_wordlen,
           CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_symbol,
           CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_alpha,
           CAST(SUM(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_stopword,
           CAST(SUM(CASE WHEN f1 OR f2 OR f3 OR f4 OR f5
                    THEN 1 ELSE 0 END) AS BIGINT) AS fail_any
         FROM f GROUP BY source""",
    "text_langid" ->
      s"""SELECT doc_id, lang,
          $sqlStopRatio AS stop_ratio,
          CASE WHEN $sqlStopRatio > 0.03
            THEN 'en_like' ELSE 'other' END AS pred
          FROM documents""",
    "langid_confusion" ->
      s"""WITH cells AS (
            SELECT source, lang,
                   CASE WHEN $sqlStopRatio > 0.03
                     THEN 'en_like' ELSE 'other' END AS pred,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2, 3)
          SELECT source, lang, pred, n,
                 CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
                   PARTITION BY source, lang) AS DOUBLE) AS share
          FROM cells""",
    "text_fingerprint" ->
      s"""SELECT doc_id, ${sqlPolyHash("text")} AS fp FROM documents""",
    "text_blocklist" ->
      """SELECT doc_id, phrase
         FROM documents,
              (VALUES ('table scan'), ('slow query'), ('hash join'))
                AS p(phrase)
         WHERE contains(text, phrase)""",
    "sample_stratified" ->
      s"""SELECT source, CAST(rn AS INT) AS rank, doc_id, fp FROM (
            SELECT source, doc_id, fp,
                   ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY fp ASC, doc_id ASC) AS rn
            FROM (SELECT source, doc_id, ${sqlPolyHash("text")} AS fp
                  FROM documents))
          WHERE rn <= 40""",
    "text_repetition" ->
      """WITH base AS (
           SELECT doc_id, string_split(text,' ') AS w FROM documents),
         grams AS (
           SELECT doc_id, w,
             CASE WHEN len(w) < 2 THEN []
                  ELSE [w[i]||' '||w[i+1] for i in range(1, len(w))] END AS g2,
             CASE WHEN len(w) < 3 THEN []
                  ELSE [w[i]||' '||w[i+1]||' '||w[i+2]
                        for i in range(1, len(w)-1)] END AS g3
           FROM base),
         fr AS (
           SELECT doc_id,
             CASE WHEN len(w) > 0
                  THEN 1 - CAST(len(list_distinct(w)) AS DOUBLE)/len(w)
                  ELSE 0.0 END AS dup_word_frac,
             CASE WHEN len(g2) > 0
                  THEN 1 - CAST(len(list_distinct(g2)) AS DOUBLE)/len(g2)
                  ELSE 0.0 END AS dup_2gram_frac,
             CASE WHEN len(g3) > 0
                  THEN 1 - CAST(len(list_distinct(g3)) AS DOUBLE)/len(g3)
                  ELSE 0.0 END AS dup_3gram_frac
           FROM grams)
         SELECT doc_id, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
                CASE WHEN dup_word_frac > 0.6 OR dup_3gram_frac > 0.2
                     THEN 'repetitive' ELSE 'ok' END AS rep_class
         FROM fr""",
    "text_freq_score" ->
      """WITH wc AS (
           SELECT w, COUNT(*) AS c
           FROM (SELECT unnest(string_split(text,' ')) AS w FROM documents)
           GROUP BY 1),
         tot AS (SELECT SUM(c) AS t FROM wc),
         topk AS (SELECT w, c FROM wc ORDER BY c DESC, w ASC LIMIT 256),
         docw AS (
           SELECT doc_id, unnest(string_split(text,' ')) AS w
           FROM documents),
         agg AS (
           SELECT d.doc_id,
                  COUNT(*) AS n_words,
                  SUM(CASE WHEN t.c IS NOT NULL THEN 1 ELSE 0 END)
                    AS known_words,
                  SUM(COALESCE(t.c, 0)) AS freq_hits
           FROM docw d LEFT JOIN topk t ON d.w = t.w
           GROUP BY 1)
         SELECT doc_id, n_words, CAST(known_words AS BIGINT) AS known_words,
                CAST(freq_hits AS BIGINT) AS freq_hits,
                CASE WHEN n_words > 0
                     THEN CAST(freq_hits AS DOUBLE) /
                          (n_words * (SELECT t FROM tot))
                     ELSE 0.0 END AS freq_score
         FROM agg""",
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         FROM documents"""
  )
}
