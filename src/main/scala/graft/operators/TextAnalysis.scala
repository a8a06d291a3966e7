package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text analysis over the documents corpus (SURVEY.md §2 block B).
  *
  * All map-only (no shuffle except final aggregates): at 100 TB these
  * run embarrassingly parallel over parquet splits, with `text` the
  * only wide column read (column pruning keeps the scan minimal).
  */
object TextAnalysis {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "les", "de", "et", "un", "est", "pour", "que", "dans", "ce"),
    "zh" -> Seq("shi", "bu", "wo", "ni", "ta", "men", "zai", "you", "he", "ma"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** English stopword list as a DuckDB array literal (shared with
    * operators that re-derive the quality formula in SQL).
    */
  val stopSqlEn: String = sqlList(stopwords("en"))

  private val duckToks =
    graft.functions.TextFunctions.duckToksSql("text")

  /** Shared cached corpus token stream (doc_id, pos, tok) — the text
    * chain's analog of the dedup chain's cached shingle stream: every
    * position-exploded token consumer (repetition, surprisal LMs, PMI,
    * keyphrases, inverted index, vocab coverage, held-out gap) derives
    * from ONE tokenization pass per session via the CacheManager
    * (identical plan → same cache entry), instead of each re-exploding
    * the corpus. Advisory at 100 TB: cached blocks are
    * storage-evictable and the plan still streams when they are
    * missing — the same contract as the shingle stream. The eager
    * count serializes cold-cache block building BEFORE consumers fan
    * out (concurrent stages over a cold cache race on per-block
    * locks — the round-1 dedup pathology). The bench's `text_warm`
    * family measures the session shape this enables.
    */
  private[graft] def tokenStream(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .cache()
    s.count()
    s
  }

  // ---------------------------------------------------------------- B1
  /** Token and character counts per document. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"),
      length(normText(col("text"))).cast("long").as("n_chars_norm"))

  val qTokenCountSql: String =
    raw"""SELECT doc_id,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_actual,
         |  CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS n_chars_norm
         |FROM documents""".stripMargin

  // ---------------------------------------------------------------- B2
  /** Stopword-ratio language ID: ratio of per-language stopword hits,
    * argmax with a fixed preference order. Map-only; the stopword
    * tables ride in the closure (at scale: still just literals in the
    * codegen'd plan, nothing broadcast).
    */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    // Single-pass shape: explode tokens once, count per-language hits
    // with codegen'd conditional aggregates (one shuffle on doc_id).
    // The projection-collapsed HOF formulation re-evaluated the
    // interpreted token filters once per downstream reference — O(30x)
    // wasted work per row at bench scale.
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
    val hitAggs = langs.map(l =>
      sum(when(col("tok").isin(stopwords(l): _*), 1).otherwise(0))
        .cast("double").as(s"hits_$l"))
    val scored = toks.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("double").as("n"), hitAggs: _*)
    val withRatios = scored.select(
      col("doc_id") +: col("lang") +:
        langs.map(l => (col(s"hits_$l") / col("n")).as(s"r_$l")): _*)
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val c = col(s"r_$l")
      val geAll = langs.filter(_ != l).map(o => c >= col(s"r_$o")).reduce(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    withRatios.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      col("r_en"), (pred === col("lang")).as("is_match"))
  }

  val qLangIdSql: String = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val hits = langs.map(l =>
      s"CAST(len(list_filter(toks, t -> list_contains(${sqlList(stopwords(l))}, t))) AS DOUBLE) / n AS r_$l")
      .mkString(",\n  ")
    val pred = langs.init.foldRight(s"'${langs.last}'") { (l, rest) =>
      val ge = langs.filter(_ != l).map(o => s"r_$l >= r_$o").mkString(" AND ")
      s"CASE WHEN $ge THEN '$l' ELSE $rest END"
    }
    raw"""WITH t AS (SELECT doc_id, lang, $duckToks AS toks,
         |  CAST(len($duckToks) AS DOUBLE) AS n FROM documents),
         |r AS (SELECT doc_id, lang,
         |  $hits
         |FROM t)
         |SELECT doc_id, lang, $pred AS pred_lang, r_en,
         |  ($pred = lang) AS is_match
         |FROM r""".stripMargin
  }

  // ---------------------------------------------------------------- B3
  /** Heuristic document quality score: stopword density, length
    * saturation, punctuation penalty. Deterministic rational
    * arithmetic; identical formula in the oracle.
    */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame =
    scoreQuality(Tables.documents(spark, dir))

  /** The same scoring over any documents-shaped frame (doc_id, text) —
    * factored out so the streaming drift monitor scores arriving
    * micro-batches with BIT-IDENTICAL arithmetic to the batch
    * operators (same expressions, same order; any divergence would
    * break the spec-asserted stream==batch KS equality).
    */
  def scoreQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs
      .select(col("doc_id"),
        tokenCount(col("text")).cast("double").as("n_tokens"),
        vocabHits(toks, stopwords("en")).cast("double").as("stop_hits"),
        length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double").as("n_punct"),
        length(col("text")).cast("double").as("n_chars"))
      .select(col("doc_id"),
        (col("stop_hits") / col("n_tokens")).as("stop_ratio"),
        least(lit(1.0), col("n_tokens") / 100.0).as("len_sat"),
        (col("n_punct") / col("n_chars")).as("punct_ratio"))
      .select(col("doc_id"), col("stop_ratio"), col("len_sat"), col("punct_ratio"),
        round(col("stop_ratio") * 0.4 + col("len_sat") * 0.3 +
          (lit(1.0) - col("punct_ratio")) * 0.3, 6).as("quality"))
  }

  /** The B3 quality score as reusable DuckDB CTEs (`...  qual`), so
    * quality-consuming oracles (K30 preference pairs) replay the
    * BIT-IDENTICAL scoring arithmetic instead of restating it.
    */
  private[operators] val qualityCtes: String =
    raw"""t AS (SELECT doc_id,
         |  CAST(len($duckToks) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter($duckToks, t -> list_contains(${sqlList(stopwords("en"))}, t))) AS DOUBLE) AS stop_hits,
         |  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS n_punct,
         |  CAST(length(text) AS DOUBLE) AS n_chars
         |FROM documents),
         |r AS (SELECT doc_id, stop_hits / n_tokens AS stop_ratio,
         |  least(1.0, n_tokens / 100.0) AS len_sat,
         |  n_punct / n_chars AS punct_ratio FROM t),
         |qual AS (SELECT doc_id, stop_ratio, len_sat, punct_ratio,
         |  round(stop_ratio * 0.4 + len_sat * 0.3 + (1.0 - punct_ratio) * 0.3, 6) AS quality
         |FROM r)""".stripMargin

  val qQualityScoreSql: String =
    s"""WITH $qualityCtes
       |SELECT doc_id, stop_ratio, len_sat, punct_ratio, quality
       |FROM qual""".stripMargin

  // ---------------------------------------------------------------- K30
  /** Preference-pair assembly — the DPO/RLHF-style training-data
    * step downstream of B3's quality score: within each (source,
    * lang) stratum, emit ONE (chosen, rejected) document pair —
    * chosen = highest quality (ties → doc_id ASC), rejected = lowest
    * quality (ties → doc_id DESC, so the two ends never collide on a
    * tie) — with the quality margin a pair-filtering curriculum
    * thresholds on. Strata with <2 documents or zero margin (no
    * strict preference signal) emit nothing: a preference pair whose
    * sides are indistinguishable teaches the reward model noise.
    * Both endpoints come from ONE window pass over the scored corpus
    * (two row_numbers over the same partition key — one shuffle);
    * quality is computed per-row (map-side, deterministic) by the
    * exact B3 expressions. At 100 TB: strata count is
    * sources×langs-bounded, the shuffle keys on the stratum, and no
    * text ever joins text — pairing happens on doc ids.
    */
  def qPreferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = scoreQuality(docs)
      .join(docs.select(col("doc_id"), col("source"), col("lang")), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"), col("quality"))
    val part = Window.partitionBy(col("source"), col("lang"))
    val best = part.orderBy(col("quality").desc, col("doc_id").asc)
    val worst = part.orderBy(col("quality").asc, col("doc_id").desc)
    scored
      .withColumn("n_docs", count(lit(1)).over(part))
      .withColumn("rb", row_number().over(best))
      .withColumn("rw", row_number().over(worst))
      .groupBy(col("source"), col("lang"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(when(col("rb") === 1, col("doc_id"))).as("chosen_id"),
        max(when(col("rb") === 1, col("quality"))).as("chosen_q"),
        max(when(col("rw") === 1, col("doc_id"))).as("rejected_id"),
        max(when(col("rw") === 1, col("quality"))).as("rejected_q"))
      .filter(col("n_docs") >= 2)
      .withColumn("margin", round(col("chosen_q") - col("rejected_q"), 6))
      .filter(col("margin") > 0)
      .select(col("source"), col("lang"), col("n_docs"),
        col("chosen_id"), col("rejected_id"),
        col("chosen_q"), col("rejected_q"), col("margin"))
  }

  val qPreferencePairsSql: String =
    s"""WITH $qualityCtes,
       |scored AS (SELECT q.doc_id, d.source, d.lang, q.quality
       |  FROM qual q JOIN documents d ON q.doc_id = d.doc_id),
       |ranked AS (SELECT *,
       |    count(*) OVER (PARTITION BY source, lang) AS n_docs,
       |    row_number() OVER (PARTITION BY source, lang
       |      ORDER BY quality DESC, doc_id ASC) AS rb,
       |    row_number() OVER (PARTITION BY source, lang
       |      ORDER BY quality ASC, doc_id DESC) AS rw
       |  FROM scored),
       |pairs AS (SELECT source, lang, max(n_docs) AS n_docs,
       |    max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
       |    max(CASE WHEN rb = 1 THEN quality END) AS chosen_q,
       |    max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
       |    max(CASE WHEN rw = 1 THEN quality END) AS rejected_q
       |  FROM ranked GROUP BY 1, 2)
       |SELECT source, lang, n_docs, chosen_id, rejected_id,
       |  chosen_q, rejected_q,
       |  round(chosen_q - rejected_q, 6) AS margin
       |FROM pairs
       |WHERE n_docs >= 2 AND round(chosen_q - rejected_q, 6) > 0""".stripMargin

  // ---------------------------------------------------------------- B4
  /** md5 content fingerprint of normalized text (engine-portable). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  val qFingerprintSql: String =
    raw"""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         |FROM documents""".stripMargin

  // ---------------------------------------------------------------- B5
  /** Rolling-hash document fingerprint via the custom codegen'd
    * [[graft.functions.RollingHash]] Catalyst expression; the oracle
    * replays the identical fold with DuckDB's list_reduce.
    */
  def qRollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      graft.functions.GraftExpressions.rolling_hash(normText(col("text"))).as("rh"))

  val qRollingFingerprintSql: String =
    raw"""SELECT doc_id, list_reduce(
         |  list_transform(generate_series(1, length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
         |    i -> ascii(substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), i, 1))::BIGINT),
         |  (acc, c) -> (acc * 31 + c) % 1000000007) AS rh
         |FROM documents""".stripMargin

  // ---------------------------------------------------------------- B2b
  /** Classifier evaluation: confusion matrix of the deterministic
    * language-ID heuristic against the labeled lang column (the
    * model-evaluation surface, oracle-checkable because the classifier
    * is a pure function of the row).
    */
  def qConfusionMatrix(spark: SparkSession, dir: String): DataFrame =
    qLangId(spark, dir)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  val qConfusionMatrixSql: String =
    s"""WITH pred AS ($qLangIdSql)
       |SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY lang, pred_lang""".stripMargin

  // ---------------------------------------------------------------- B1b
  /** BPE-ish subword tokenization twin of B1: pieces are maximal runs
    * of letters, digit runs, or single non-alphanumeric marks — the
    * pre-merge piece inventory a byte-pair tokenizer starts from. The
    * pattern is shared verbatim with the oracle; counts per document
    * (map-only, codegen regexp).
    */
  private val piecePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def qRegexTokens(spark: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(norm, lit(piecePattern), lit(0)))
        .cast("long").as("n_pieces"),
      size(regexp_extract_all(norm, lit("[a-z]+"), lit(0)))
        .cast("long").as("n_word_pieces"))
  }

  val qRegexTokensSql: String =
    raw"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '$piecePattern')) AS BIGINT) AS n_pieces,
         |  CAST(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '[a-z]+')) AS BIGINT) AS n_word_pieces
         |FROM documents""".stripMargin

  // ---------------------------------------------------------------- B17
  /** Tokenizer fertility per language — subword pieces per whitespace
    * word (B1b's pieces over B1's tokens): THE cost/capacity metric
    * for a multilingual mix — a language at fertility 2.3 pays 2.3×
    * the context budget of one at 1.1 for the same word count, which
    * reprices every per-token mixture weight (K3) and chunk plan
    * (K11). Both counts per doc are map-only codegen regexes; one
    * lang-keyed aggregate of exact integers; the two ratios
    * (fertility, pieces/doc) divide once at the 6-dp boundary.
    */
  def qTokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(norm, lit(piecePattern), lit(0)))
          .cast("long").as("p"),
        size(tokens(col("text"))).cast("long").as("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"), sum(col("p")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 6))
      .withColumn("pieces_per_doc",
        round(col("n_pieces").cast("double") / col("n_docs"), 6))
  }

  val qTokenizerFertilitySql: String =
    raw"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS n_words,
         |  CAST(sum(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '$piecePattern'))) AS BIGINT) AS n_pieces,
         |  round(sum(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '$piecePattern'))) * 1.0
         |    / sum(len($duckToks)), 6) AS fertility,
         |  round(sum(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '$piecePattern'))) * 1.0
         |    / count(*), 6) AS pieces_per_doc
         |FROM documents GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------- B13
  /** Character-distribution entropy — the classic gibberish /
    * encoding-junk gate a corpus pipeline runs before any model-based
    * scoring: natural language has ~3.5-4.2 bits/char over
    * [a-z ]; mojibake, base64 blobs, and single-char floods fall
    * outside. Counts for the CLOSED 27-symbol alphabet (a-z + space)
    * are taken as `length(n) - length(replace(n, c, ''))`, staged
    * through ONE array column (see [[scoreCharEntropy]]) — MAP-ONLY,
    * zero shuffles, no explode: the per-row work is independent of
    * corpus size, which is the whole design at 100 TB (a char-explode
    * formulation would shuffle ~1000x the row count for the same
    * answer). Both the Spark fold and the oracle SQL are generated
    * from the same alphabet list in the same fold order, so the
    * double-sum associates identically; the verdict booleans compare
    * the 6-dp-rounded values on both sides.
    */
  private val entropyAlphabet: Seq[Char] = ('a' to 'z') :+ ' '

  def qCharEntropy(spark: SparkSession, dir: String): DataFrame =
    scoreCharEntropy(Tables.documents(spark, dir))

  /** The same scoring over any (doc_id, text) frame — factored out so
    * specs can assert the formula on crafted strings (uniform string
    * → log2(k), single-char flood → 0 and gated).
    *
    * The 27 per-symbol counts are STAGED through one array column and
    * folded with higher-order functions, so each count (and the
    * normalized string) is authored exactly once in the plan. The
    * earlier formulation inlined the count subtree into every term of
    * the entropy sum — CollapseProject + codegen expanded it to
    * ~1500 translate/regexp copies, costing ~8 s of fixed
    * analysis/compile time per run regardless of data size (measured
    * r9; 13.3 s → sub-second at sf0.1 after staging). Fold order is
    * a→z→space left-to-right with a 0.0 seed (IEEE-identical to the
    * oracle's left-associated `+` chain: x + 0.0 = x exactly for the
    * non-negative summands here).
    */
  def scoreCharEntropy(docs: DataFrame): DataFrame = {
    val alphaArr = array(entropyAlphabet.map(c => lit(c.toString)): _*)
    val staged = docs
      .select(col("doc_id"), normText(col("text")).as("n"))
      .select(col("doc_id"),
        transform(alphaArr, ch =>
          (length(col("n")) - length(replace(col("n"), ch, lit("")))).cast("double"))
          .as("cnts"))
      .select(col("doc_id"), col("cnts"),
        aggregate(col("cnts"), lit(0.0), _ + _).as("na"))
    def term(cnt: Column): Column =
      when(cnt > 0, -(cnt / col("na")) * log2(cnt / col("na"))).otherwise(lit(0.0))
    val ent = when(col("na") > 0,
      aggregate(transform(col("cnts"), term _), lit(0.0), _ + _)).otherwise(lit(0.0))
    val maxRatio = when(col("na") > 0, array_max(col("cnts")) / col("na"))
      .otherwise(lit(0.0))
    staged.select(
      col("doc_id"),
      col("na").cast("long").as("n_alpha"),
      round(ent, 6).as("char_entropy"),
      round(maxRatio, 6).as("max_char_ratio"),
      (round(ent, 6) >= 3.0 && round(maxRatio, 6) <= 0.5).as("passes_gibberish"))
  }

  val qCharEntropySql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    def cntSql(c: Char): String = {
      val lit = if (c == ' ') "' '" else s"'$c'"
      s"CAST(length(n) - length(replace(n, $lit, '')) AS DOUBLE)"
    }
    val cnts = entropyAlphabet.map(cntSql)
    val nAlpha = cnts.mkString("(", " + ", ")")
    val terms = cnts.map(c =>
      s"CASE WHEN $c > 0 THEN -($c / na) * log2($c / na) ELSE 0.0 END")
      .mkString("(", " + ", ")")
    val maxCnt = cnts.mkString("greatest(", ", ", ")")
    raw"""WITH t AS (SELECT doc_id, $norm AS n FROM documents),
         |w AS (SELECT doc_id, n, $nAlpha AS na FROM t),
         |s AS (SELECT doc_id, na,
         |    CASE WHEN na > 0 THEN $terms ELSE 0.0 END AS ent,
         |    CASE WHEN na > 0 THEN $maxCnt / na ELSE 0.0 END AS mr
         |  FROM w)
         |SELECT doc_id, CAST(na AS BIGINT) AS n_alpha,
         |  round(ent, 6) AS char_entropy,
         |  round(mr, 6) AS max_char_ratio,
         |  (round(ent, 6) >= 3.0 AND round(mr, 6) <= 0.5) AS passes_gibberish
         |FROM s""".stripMargin
  }

  // ---------------------------------------------------------------- B6
  /** Stratified sampling of the corpus by language — the
    * training-data-mix primitive (hold or reshape label proportions
    * while downsampling). The draw is an md5-threshold per row —
    * bucket = md5(doc_id:strat) mod 10000 < rate·10000 — the same
    * engine-portable trick as the K2 hash split: fully distributed,
    * map-only, no shuffle, AND deterministic across runs, machines,
    * and engines, which `sampleBy`'s seeded RNG is not. That last
    * property is what makes re-runs reproducible at 100 TB and the
    * result oracle-checkable. Output is the per-stratum sample audit
    * (drawn size vs target rate).
    */
  val StratRates: Seq[(String, Double)] =
    Seq("en" -> 0.3, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.7, "zh" -> 0.7)

  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bucket =
      expr("conv(substring(md5(concat(cast(doc_id as string), ':strat')), 1, 15), 16, 10)")
        .cast("long") % 10000
    val threshold = StratRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit((r * 10000).toInt)).otherwise(acc)
    }
    val sample = docs.filter(bucket < threshold)
    sample.groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total")), "lang")
      .select(col("lang"), col("n_sampled"), col("n_total"),
        round(col("n_sampled").cast("double") / col("n_total"), 4).as("rate"))
  }

  val qStratifiedSampleSql: String = {
    val thresholdSql = StratRates
      .map { case (l, r) => s"WHEN '$l' THEN ${(r * 10000).toInt}" }
      .mkString(" ")
    raw"""WITH b AS (SELECT lang,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15))::BIGINT % 10000 AS bucket
         |  FROM documents),
         |t AS (SELECT lang, count(*) AS n_total FROM b GROUP BY lang),
         |s AS (SELECT lang, count(*) AS n_sampled FROM b
         |  WHERE bucket < CASE lang $thresholdSql ELSE 0 END GROUP BY lang)
         |SELECT lang, n_sampled, n_total,
         |  round(CAST(n_sampled AS DOUBLE) / n_total, 4) AS rate
         |FROM s JOIN t USING (lang)""".stripMargin
  }

  // ---------------------------------------------------------------- B7
  /** End-to-end corpus keep-list: the decision a training-data
    * pipeline actually ships — one row per document with the keep
    * verdict and the dominant drop reason. A document survives when
    * (1) it is the canonical copy of its exact-dup group (smallest
    * doc_id per content fingerprint) and (2) its quality score clears
    * the floor. Composes B3 + C1 semantics; reasons are ordered
    * dup > low_quality so the verdict is deterministic. Entirely
    * joins/aggregates on (hash, id, score) — the payload never
    * reshuffles; at 100 TB this is one fingerprint shuffle + one
    * broadcast-sized quality threshold scan.
    */
  val QualityFloor = 0.55

  def qKeepList(spark: SparkSession, dir: String): DataFrame = {
    val canon = Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("canonical_id"))
    val q = qQualityScore(spark, dir).select(col("doc_id"), col("quality"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .join(canon, "fp")
      .join(q, "doc_id")
      .select(col("doc_id"),
        (col("doc_id") === col("canonical_id") &&
          col("quality") >= QualityFloor).as("keep"),
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("quality") < QualityFloor, "low_quality")
          .otherwise("kept").as("reason"))
  }

  val qKeepListSql: String =
    raw"""WITH fps AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |canon AS (SELECT fp, min(doc_id) AS canonical_id FROM fps GROUP BY fp),
         |q AS ($qQualityScoreSql)
         |SELECT f.doc_id,
         |  (f.doc_id = c.canonical_id AND q.quality >= $QualityFloor) AS keep,
         |  CASE WHEN f.doc_id <> c.canonical_id THEN 'exact_dup'
         |       WHEN q.quality < $QualityFloor THEN 'low_quality'
         |       ELSE 'kept' END AS reason
         |FROM fps f JOIN canon c ON f.fp = c.fp JOIN q ON q.doc_id = f.doc_id""".stripMargin

  // ---------------------------------------------------------------- B14
  /** RAKE keyphrase extraction (Rose et al., 2010): candidate phrases
    * are maximal runs of non-stopword tokens; each word scores
    * degree/frequency over the corpus phrase set (degree = Σ length
    * of phrases containing the word — favors words that live in long
    * collocations); a phrase scores the sum of its word scores; top-3
    * per document. The classic zero-model keyword extractor a corpus
    * pipeline runs for indexing/faceting before anything learned.
    * Shapes worth noting: phrase segmentation is a RUNNING COUNT of
    * stopwords over the position window (one doc-bounded window, the
    * B11 device — no UDF, no iteration); phrase strings are
    * reassembled ORDER-DETERMINISTICALLY via array_sort over
    * (pos, tok) structs (collect_list alone has no order contract);
    * the word-score table is vocabulary-sized and joins back by
    * broadcast at any corpus scale.
    */
  def qKeyphrases(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokenStream(spark, dir)
      .withColumn("is_stop", col("tok").isin(stopwords("en").map(x => x: Any): _*))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = toks
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("pid"), col("pos"), col("tok"))
    val plen = words.groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("plen"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"))
    val wstat = words.join(plen.select(col("doc_id"), col("pid"), col("plen")),
        Seq("doc_id", "pid"))
      .groupBy(col("tok"))
      .agg((sum(col("plen")).cast("double") / count(lit(1))).as("wscore"))
    val pscore = words.join(broadcast(wstat), "tok")
      .groupBy(col("doc_id"), col("pid"))
      .agg(round(sum(col("wscore")), 6).as("score"))
    val ranked = pscore.join(plen, Seq("doc_id", "pid"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("phrase").asc)))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("phrase"), col("score"), col("rank"))
    ranked
  }

  val qKeyphrasesSql: String = {
    val stops = sqlList(stopwords("en"))
    raw"""WITH toks AS (SELECT doc_id, t.i AS pos, t.tok,
         |    list_contains($stops, t.tok) AS is_stop
         |  FROM (SELECT doc_id, $duckToks AS a FROM documents),
         |    LATERAL (SELECT unnest(a) AS tok, unnest(generate_series(1, len(a))) AS i) t),
         |words AS (SELECT doc_id, pid, pos, tok FROM (
         |    SELECT doc_id, pos, tok, is_stop,
         |      sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY doc_id ORDER BY pos) AS pid
         |    FROM toks) WHERE NOT is_stop),
         |plen AS (SELECT doc_id, pid, count(*) AS plen,
         |    string_agg(tok, ' ' ORDER BY pos) AS phrase
         |  FROM words GROUP BY doc_id, pid),
         |wstat AS (SELECT tok, CAST(sum(plen) AS DOUBLE) / count(*) AS wscore
         |  FROM words JOIN plen USING (doc_id, pid) GROUP BY tok),
         |ps AS (SELECT doc_id, pid, round(sum(wscore), 6) AS score
         |  FROM words JOIN wstat USING (tok) GROUP BY doc_id, pid),
         |r AS (SELECT doc_id, phrase, score, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rank
         |  FROM ps JOIN plen USING (doc_id, pid))
         |SELECT doc_id, phrase, score, rank FROM r WHERE rank <= 3""".stripMargin
  }

  // ---------------------------------------------------------------- B15
  /** Flesch reading-ease per document, from pure run-counting — no
    * dictionary, no per-word explode: words are runs of non-space,
    * sentences runs of [.!?] (floored at 1), syllables approximated
    * as runs of [aeiouy] in the lowercased text (vowel runs cannot
    * cross a space, so whole-text counting equals the per-word sum).
    * Each count is length(replace runs with '#') − length(delete
    * runs) — three codegen'd regexes per doc, MAP-ONLY, zero
    * shuffles, per-row work independent of corpus size. The readable
    * /standard/difficult banding rides the 4-dp-rounded score so
    * both engines band identically. CJK text degrades gracefully
    * (one "word", 0 vowels → hard band), matching the B2 lang gate
    * that would route it elsewhere anyway.
    */
  private def runCount(c: org.apache.spark.sql.Column, pat: String) =
    (length(regexp_replace(c, pat, "#")) - length(regexp_replace(c, pat, "")))
      .cast("long")

  def qReadability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("s"))
      .select(col("doc_id"),
        runCount(col("s"), "[^ \\n\\t]+").as("n_words"),
        greatest(runCount(col("s"), "[.!?]+"), lit(1L)).as("n_sentences"),
        runCount(col("s"), "[aeiouy]+").as("n_syllables"))
      .filter(col("n_words") > 0)
      // round(206.835 − 1.015·w/s − 84.6·y/w, 4) in EXACT integer
      // arithmetic: ×10⁴ the score is numer·10 / (s·w) with
      // numer = 206835·s·w − 1015·w² − 84600·y·s, and sign-aware
      // half-up is sign·((2|a| + b) DIV 2b) — a double round() here
      // sat on a half-ulp knife edge at sf0.1 (…19375 quotient)
      .withColumn("numer10",
        (lit(206835L) * col("n_sentences") * col("n_words") -
          lit(1015L) * col("n_words") * col("n_words") -
          lit(84600L) * col("n_syllables") * col("n_sentences")) * 10L)
      .withColumn("flesch",
        (signum(col("numer10")) * expr(
          """(2 * abs(numer10) + n_sentences * n_words)
            |  DIV (2 * n_sentences * n_words)""".stripMargin))
          .cast("double") / 10000.0)
      .drop("numer10")
      .withColumn("band",
        when(col("flesch") >= 70, "easy")
          .when(col("flesch") >= 30, "standard").otherwise("difficult"))

  val qReadabilitySql: String =
    raw"""WITH c AS (SELECT doc_id,
         |    length(regexp_replace(lower(text), '[^ \n\t]+', '#', 'g'))
         |      - length(regexp_replace(lower(text), '[^ \n\t]+', '', 'g')) AS n_words,
         |    greatest(length(regexp_replace(lower(text), '[.!?]+', '#', 'g'))
         |      - length(regexp_replace(lower(text), '[.!?]+', '', 'g')), 1) AS n_sentences,
         |    length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
         |      - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS n_syllables
         |  FROM documents),
         |f0 AS (SELECT doc_id, n_words, n_sentences, n_syllables,
         |    (206835 * n_sentences * n_words - 1015 * n_words * n_words
         |      - 84600 * n_syllables * n_sentences) * 10 AS numer10
         |  FROM c WHERE n_words > 0),
         |f AS (SELECT doc_id, n_words, n_sentences, n_syllables,
         |    CAST(sign(numer10) * ((2 * abs(numer10) + n_sentences * n_words)
         |      // (2 * n_sentences * n_words)) AS DOUBLE) / 10000.0 AS flesch
         |  FROM f0)
         |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
         |  CASE WHEN flesch >= 70 THEN 'easy'
         |       WHEN flesch >= 30 THEN 'standard'
         |       ELSE 'difficult' END AS band
         |FROM f""".stripMargin

  // ---------------------------------------------------------------- B13
  /** Inverted-index construction: per term, document frequency, total
    * term frequency, idf, and a CAPPED posting-list head (first 5
    * doc_ids ascending, comma-joined) with a truncation flag — the
    * retrieval-index build step as a query. The cap is applied with
    * row_number ≤ k over (term, doc_id) so Spark's WindowGroupLimit
    * pushes a partial top-k BEFORE the shuffle — a stopword term with
    * a billion postings never materializes a billion-element array
    * (the collect_set scale trap this op exists to avoid). Stats ride
    * one term aggregate; df ≥ 5 bounds the emitted vocabulary tail.
    */
  def qInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val td = tokenStream(spark, dir)
      .select(col("doc_id"), col("tok").as("term"))
      .filter(length(col("term")) > 0)
    val stats = td.groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 5)
    val tot = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val posting = td.select(col("term"), col("doc_id")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 5)
      .groupBy(col("term"))
      .agg(concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string"))).as("posting"))
    stats.join(posting, "term").crossJoin(broadcast(tot))
      .select(col("term"), col("df"), col("tf"),
        round(log(col("n").cast("double") / col("df")), 6).as("idf"),
        col("posting"), (col("df") > 5).as("truncated"))
  }

  val qInvertedIndexSql: String =
    raw"""WITH td AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |td2 AS (SELECT doc_id, term FROM td WHERE length(term) > 0),
         |stats AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
         |  FROM td2 GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5),
         |tot AS (SELECT count(*) AS n FROM documents),
         |dd AS (SELECT DISTINCT term, doc_id FROM td2),
         |rn AS (SELECT term, doc_id,
         |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
         |  FROM dd),
         |post AS (SELECT term,
         |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting
         |  FROM rn WHERE rn <= 5 GROUP BY 1)
         |SELECT s.term, s.df, s.tf,
         |  round(ln(CAST(n AS DOUBLE) / s.df), 6) AS idf,
         |  p.posting, s.df > 5 AS truncated
         |FROM stats s JOIN post p USING (term), tot""".stripMargin

  // ---------------------------------------------------------------- B18
  /** Template-farm detector: per-source word-trigram diversity — the
    * crawl-quality gate that catches a source whose documents are one
    * boilerplate skeleton with slot-filled values (healthy token mix,
    * near-zero NOVEL phrasing; exactly the corpus pathology near-dup
    * hashing at the document level misses when every page differs by
    * a few tokens). Per source: trigram volume, distinct trigrams,
    * `diversity` = distinct/total (templated sources read ≪ 1),
    * `top_share` = the single most repeated trigram's mass. Map-side
    * trigram explode (array transform on the shared tokenizer — no
    * shuffle until the keyed aggregate); the per-(source, trigram)
    * frame is the only shuffle and the output is |sources| rows.
    * Exact integer counts; 6-dp boundary divisions only.
    */
  def qTemplateScore(spark: SparkSession, dir: String): DataFrame = {
    val tri = Tables.documents(spark, dir)
      .select(col("source"), tokens(col("text")).as("toks"))
      .select(col("source"), explode(expr(
        """CASE WHEN size(toks) >= 3
          |THEN transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
          |ELSE array() END""".stripMargin)).as("tri"))
    val per = tri.groupBy(col("source"), col("tri")).agg(count(lit(1)).as("c"))
    per.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_trigrams"),
        count(lit(1)).as("distinct_trigrams"),
        max(col("c")).as("top_count"))
      .select(col("source"), col("n_trigrams"), col("distinct_trigrams"),
        round(col("distinct_trigrams").cast("double") / col("n_trigrams"), 6)
          .as("diversity"),
        round(col("top_count").cast("double") / col("n_trigrams"), 6)
          .as("top_share"))
  }

  val qTemplateScoreSql: String =
    raw"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
         |tri AS (SELECT source, unnest(list_transform(
         |    generate_series(1, greatest(len(toks) - 2, 0)),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tri
         |  FROM t),
         |per AS (SELECT source, tri, count(*) AS c FROM tri GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS n_trigrams,
         |  count(*) AS distinct_trigrams,
         |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS diversity,
         |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share
         |FROM per GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- B19
  /** Multinomial Naive Bayes language id, trained AND scored entirely
    * in relational arithmetic — the counterpoint to the E7 LBFGS fits:
    * because an NB fit IS a pair of count aggregates, the whole
    * pipeline (fold split, Laplace-smoothed likelihoods, log-space
    * scoring, argmax, confusion matrix) replays bit-for-bit in the
    * oracle with no persisted-artifact indirection. Deterministic
    * doc_id%5 held-out split (replayable in SQL, unlike a hash fold);
    * smoothing ln((c+1)/(n_l+V)) and priors ln(n_d/N) rounded at
    * 10 dp per term; per-(doc, class) scores sum token terms (unseen
    * tokens take the class's smoothed-zero mass) with a 6-dp boundary
    * round and class-name tiebreak on the argmax. Scale shape: model =
    * one (lang, token) aggregate (vocab-bounded, the B9 unigram-LM
    * frame); scoring = test tokens × |langs| (≤ 5) broadcast-joined
    * against the model — one keyed shuffle, output 25 rows max.
    */
  def qNaiveBayes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val train = toks.filter(col("doc_id") % 5 =!= 0)
    val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val nd = trainDocs.groupBy(col("lang")).agg(count(lit(1)).as("ndocs"))
    val ndTot = trainDocs.agg(count(lit(1)).as("tot"))
    val prior = nd.crossJoin(broadcast(ndTot))
      .select(col("lang"),
        round(log(col("ndocs").cast("double") / col("tot")), 10).as("lp"))
    val v = train.agg(countDistinct(col("tok")).as("v"))
    val nl = train.groupBy(col("lang")).agg(count(lit(1)).as("ntok"))
    val ct = train.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
    val ll = ct.join(nl, "lang").crossJoin(broadcast(v))
      .select(col("lang"), col("tok"),
        round(log((col("c") + 1).cast("double") / (col("ntok") + col("v"))), 10)
          .as("ll"))
    val unseen = nl.crossJoin(broadcast(v))
      .select(col("lang"),
        round(log(lit(1.0) / (col("ntok") + col("v"))), 10).as("ull"))
    val scored = toks.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang").as("true_lang"), col("tok"))
      .crossJoin(broadcast(prior))
      .join(ll, Seq("lang", "tok"), "left")
      .join(broadcast(unseen), "lang")
      .groupBy(col("doc_id"), col("true_lang"), col("lang"), col("lp"))
      .agg(round(col("lp") + sum(coalesce(col("ll"), col("ull"))), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .groupBy(col("true_lang"), col("lang").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  val qNaiveBayesSql: String =
    raw"""WITH toks0 AS (SELECT doc_id, lang, unnest($duckToks) AS tok FROM documents),
         |tk AS (SELECT * FROM toks0 WHERE length(tok) > 0),
         |train AS (SELECT * FROM tk WHERE doc_id % 5 <> 0),
         |td AS (SELECT lang, count(*) AS ndocs FROM documents
         |  WHERE doc_id % 5 <> 0 GROUP BY 1),
         |tot AS (SELECT count(*) AS tot FROM documents WHERE doc_id % 5 <> 0),
         |prior AS (SELECT lang, round(ln(CAST(ndocs AS DOUBLE) / tot), 10) AS lp
         |  FROM td, tot),
         |v AS (SELECT count(DISTINCT tok) AS v FROM train),
         |nl AS (SELECT lang, count(*) AS ntok FROM train GROUP BY 1),
         |ct AS (SELECT lang, tok, count(*) AS c FROM train GROUP BY 1, 2),
         |ll AS (SELECT ct.lang, ct.tok,
         |    round(ln(CAST(ct.c + 1 AS DOUBLE) / (nl.ntok + v.v)), 10) AS ll
         |  FROM ct JOIN nl USING (lang), v),
         |unseen AS (SELECT lang, round(ln(1.0 / (ntok + v)), 10) AS ull FROM nl, v),
         |sc AS (SELECT t.doc_id, t.lang AS true_lang, p.lang,
         |    round(p.lp + sum(coalesce(ll.ll, u.ull)), 6) AS score
         |  FROM tk t CROSS JOIN prior p
         |  LEFT JOIN ll ON ll.lang = p.lang AND ll.tok = t.tok
         |  JOIN unseen u ON u.lang = p.lang
         |  WHERE t.doc_id % 5 = 0
         |  GROUP BY 1, 2, 3, p.lp),
         |pred AS (SELECT doc_id, true_lang, lang AS pred_lang FROM (
         |    SELECT doc_id, true_lang, lang, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS r FROM sc)
         |  WHERE r = 1)
         |SELECT true_lang, pred_lang, count(*) AS n
         |FROM pred GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- B21
  /** Cohen's kappa for the lang-id heuristic — the chance-corrected
    * agreement number B2b's raw confusion matrix doesn't give you
    * (a classifier on a 90%-one-class corpus scores 90% accuracy by
    * always answering the mode; kappa subtracts exactly that):
    * κ = (p_o − p_e)/(1 − p_e) with p_e from the marginal products.
    * Everything is integer arithmetic over the ≤ |langs|² confusion
    * cells until ONE division: κ = (N·diag − Σ_k row_k·col_k)
    * / (N² − Σ_k row_k·col_k) — numerator and denominator exact in
    * DECIMAL(38,0) (N² caps the magnitude; exact to N ~ 10¹⁹), the
    * quotient rounds at 6 dp, and the Landis–Koch verdict band cuts
    * on the ROUNDED value so both engines band identical IEEE
    * doubles. Degenerate p_e = 1 (single-class truth AND prediction)
    * publishes null kappa with band 'undefined'.
    */
  def qCohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val cm = qConfusionMatrix(spark, dir)
    val n = cm.agg(sum(col("n")).cast("decimal(38,0)").as("nn"),
      sum(when(col("lang") === col("pred_lang"), col("n")).otherwise(0L))
        .cast("decimal(38,0)").as("diag"))
    val rows = cm.groupBy(col("lang").as("k")).agg(sum(col("n")).as("rk"))
    val cols = cm.groupBy(col("pred_lang").as("k")).agg(sum(col("n")).as("ck"))
    val pe = rows.join(cols, Seq("k"), "inner")
      .agg(sum(col("rk").cast("decimal(38,0)") * col("ck")).as("pen"))
    val kap = n.crossJoin(broadcast(pe))
      .withColumn("den", col("nn") * col("nn") - col("pen"))
      .withColumn("kappa", when(col("den") <= 0, lit(null).cast("double"))
        .otherwise(round((col("nn") * col("diag") - col("pen"))
          .cast("double") / col("den").cast("double"), 6)))
    kap.select(col("nn").cast("long").as("n_docs"),
      round(col("diag").cast("double") / col("nn").cast("double"), 6)
        .as("po"),
      round(col("pen").cast("double") /
        (col("nn") * col("nn")).cast("double"), 6).as("pe"),
      col("kappa"),
      when(col("kappa").isNull, lit("undefined"))
        .when(col("kappa") < 0.2, lit("slight"))
        .when(col("kappa") < 0.4, lit("fair"))
        .when(col("kappa") < 0.6, lit("moderate"))
        .when(col("kappa") < 0.8, lit("substantial"))
        .otherwise(lit("almost_perfect")).as("band"))
  }

  val qCohensKappaSql: String =
    s"""WITH cm AS ($qConfusionMatrixSql),
       |nn AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
       |    CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
       |      AS HUGEINT) AS diag
       |  FROM cm),
       |rk AS (SELECT lang AS k, sum(n) AS rk FROM cm GROUP BY 1),
       |ck AS (SELECT pred_lang AS k, sum(n) AS ck FROM cm GROUP BY 1),
       |pe AS (SELECT CAST(sum(CAST(rk.rk AS HUGEINT) * ck.ck) AS HUGEINT)
       |    AS pen
       |  FROM rk JOIN ck USING (k)),
       |kap AS (SELECT nn, diag, pen, nn * nn - pen AS den,
       |    CASE WHEN nn * nn - pen <= 0 THEN NULL
       |      ELSE round(CAST(nn * diag - pen AS DOUBLE)
       |        / CAST(nn * nn - pen AS DOUBLE), 6) END AS kappa
       |  FROM nn, pe)
       |SELECT CAST(nn AS BIGINT) AS n_docs,
       |  round(CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
       |  round(CAST(pen AS DOUBLE) / CAST(nn * nn AS DOUBLE), 6) AS pe,
       |  kappa,
       |  CASE WHEN kappa IS NULL THEN 'undefined'
       |    WHEN kappa < 0.2 THEN 'slight'
       |    WHEN kappa < 0.4 THEN 'fair'
       |    WHEN kappa < 0.6 THEN 'moderate'
       |    WHEN kappa < 0.8 THEN 'substantial'
       |    ELSE 'almost_perfect' END AS band
       |FROM kap""".stripMargin

  // ---------------------------------------------------------------- B22
  /** Multiclass Matthews correlation (Gorodkin's R_K) for the lang-id
    * heuristic — the third agreement number beside accuracy and B21's
    * kappa, and the one robust to BOTH class imbalance and a
    * degenerate predictor (kappa can reward a classifier that matches
    * the marginal by luck; MCC is the full correlation of the
    * confusion tensor): R_K = (c·s − Σ_k p_k·t_k)
    * / √((s² − Σp²)(s² − Σt²)) over the ≤ |langs|² cells. Every
    * numerator term is an exact integer (HUGEINT/DECIMAL(38,0) —
    * exact to s ~ 10⁹ per the s² bound), the two radicands stay
    * exact, and ONE double expression (identical in both engines)
    * produces the 6-dp value. Single-class truth or prediction
    * zeroes a radicand → null, not a divide error.
    */
  def qMcc(spark: SparkSession, dir: String): DataFrame = {
    val cm = qConfusionMatrix(spark, dir)
    val n = cm.agg(sum(col("n")).cast("decimal(38,0)").as("s"),
      sum(when(col("lang") === col("pred_lang"), col("n")).otherwise(0L))
        .cast("decimal(38,0)").as("c"))
    val rows = cm.groupBy(col("lang").as("k"))
      .agg(sum(col("n")).cast("decimal(38,0)").as("tk"))
    val cols = cm.groupBy(col("pred_lang").as("k"))
      .agg(sum(col("n")).cast("decimal(38,0)").as("pk"))
    val cross = rows.join(cols, Seq("k"), "full_outer")
      .na.fill(0L, Seq.empty) // decimals: coalesce below
      .select(coalesce(col("tk"), lit(0).cast("decimal(38,0)")).as("tk"),
        coalesce(col("pk"), lit(0).cast("decimal(38,0)")).as("pk"))
      .agg(sum(col("tk") * col("pk")).as("ptsum"),
        sum(col("pk") * col("pk")).as("p2"),
        sum(col("tk") * col("tk")).as("t2"))
    val m = n.crossJoin(broadcast(cross))
      .withColumn("num", (col("c") * col("s") - col("ptsum")).cast("double"))
      .withColumn("d1", (col("s") * col("s") - col("p2")).cast("double"))
      .withColumn("d2", (col("s") * col("s") - col("t2")).cast("double"))
    m.select(col("s").cast("long").as("n_docs"),
      when(col("d1") <= 0 || col("d2") <= 0, lit(null).cast("double"))
        .otherwise(round(col("num") / sqrt(col("d1") * col("d2")), 6))
        .as("mcc"))
  }

  val qMccSql: String =
    s"""WITH cm AS ($qConfusionMatrixSql),
       |nn AS (SELECT CAST(sum(n) AS HUGEINT) AS s,
       |    CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
       |      AS HUGEINT) AS c
       |  FROM cm),
       |tk AS (SELECT lang AS k, CAST(sum(n) AS HUGEINT) AS tk FROM cm GROUP BY 1),
       |pk AS (SELECT pred_lang AS k, CAST(sum(n) AS HUGEINT) AS pk
       |  FROM cm GROUP BY 1),
       |cx AS (SELECT coalesce(tk.k, pk.k) AS k,
       |    coalesce(tk, CAST(0 AS HUGEINT)) AS tk,
       |    coalesce(pk, CAST(0 AS HUGEINT)) AS pk
       |  FROM tk FULL OUTER JOIN pk ON tk.k = pk.k),
       |agg AS (SELECT CAST(sum(tk * pk) AS HUGEINT) AS ptsum,
       |    CAST(sum(pk * pk) AS HUGEINT) AS p2,
       |    CAST(sum(tk * tk) AS HUGEINT) AS t2
       |  FROM cx),
       |m AS (SELECT s, CAST(c * s - ptsum AS DOUBLE) AS num,
       |    CAST(s * s - p2 AS DOUBLE) AS d1,
       |    CAST(s * s - t2 AS DOUBLE) AS d2
       |  FROM nn, agg)
       |SELECT CAST(s AS BIGINT) AS n_docs,
       |  CASE WHEN d1 <= 0 OR d2 <= 0 THEN NULL
       |    ELSE round(num / sqrt(d1 * d2), 6) END AS mcc
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- B23
  /** PII detection + redaction audit — the scrub gate every
    * LLM-corpus pipeline runs before text reaches a training shard
    * (emails, phone numbers, IP addresses), here as a per-source
    * verdict: hit counts per PII class, documents flagged, characters
    * a `[PII]` redaction pass would rewrite, and the per-source flag
    * rate. The generated corpus contains no organic PII, so the
    * operator plants it DETERMINISTICALLY from doc_id (the multimodal
    * block's stub-decoder device: the synthesis is arithmetic both
    * engines reproduce bit-for-bit — doc_id % 5 gets an email,
    * % 7 a phone, % 11 an IP — which also yields known-truth counts
    * the spec asserts exactly); the detection/redaction regexes then
    * run on the augmented text exactly as they would on a real crawl.
    * Regex battery is anchored to engine-portable syntax (character
    * classes + bounded quantifiers only — no lookaround, no shorthand
    * classes that differ between Java regex and RE2). Map-only scan →
    * one |sources|-row aggregate; counts exact integers, one 6-dp
    * rate division.
    */
  /** Per-document PII hit counts + redaction delta — factored from
    * [[qPiiScan]] so the curation funnel (K25) can consume the same
    * flags per doc that the per-source audit aggregates.
    */
  private val piiEmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val piiPhoneRe = "\\+1-555-[0-9]{4}"
  private val piiIpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val piiAllRe = s"($piiEmailRe|$piiPhoneRe|$piiIpRe)"

  /** The deterministic PII-planting augmentation (see [[qPiiScan]]) as
    * a column over a frame carrying `doc_id` — factored so the per-doc
    * audit and the K25 gate build the identical string (exact integer
    * DIV, never a double division).
    */
  private def piiAug(docId: Column, text: Column): Column =
    concat(text,
      when(docId % 5 === 0,
        concat(lit(" contact user"), docId.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(docId % 7 === 0,
        concat(lit(" call +1-555-"),
          lpad((docId % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(docId % 11 === 0,
        concat(lit(" host 10."), (docId % 256).cast("string"),
          lit("."), (expr("doc_id DIV 7") % 256).cast("string"),
          lit("."), (expr("doc_id DIV 13") % 256).cast("string")))
        .otherwise(lit("")))

  /** The K25 funnel's PII verdict without the counts: true ⟺
    * n_email + n_phone + n_ip = 0 ⟺ the alternation of the three
    * class regexes never matches the augmented text (same Java-regex
    * find semantics as regexp_extract_all) — one early-exit rlike per
    * doc instead of three full extract_all passes. Only legitimate
    * where the counts themselves are not published.
    */
  private[operators] def piiNoHit(docId: Column, text: Column): Column =
    !piiAug(docId, text).rlike(piiAllRe)

  private[operators] def piiPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val aug = Tables.documents(spark, dir)
      .withColumn("aug", piiAug(col("doc_id"), col("text")))
    aug.select(col("doc_id"), col("source"),
      size(regexp_extract_all(col("aug"), lit(piiEmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("aug"), lit(piiPhoneRe), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(col("aug"), lit(piiIpRe), lit(0)))
        .cast("long").as("n_ip"),
      (length(col("aug")) -
        length(regexp_replace(col("aug"), piiAllRe, "[PII]")))
        .cast("long").as("chars_delta"))
  }

  def qPiiScan(spark: SparkSession, dir: String): DataFrame = {
    piiPerDoc(spark, dir).groupBy(col("source")).agg(
        count(lit(1)).as("docs"),
        sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
          .otherwise(0L)).as("docs_flagged"),
        sum(col("n_email")).cast("long").as("emails"),
        sum(col("n_phone")).cast("long").as("phones"),
        sum(col("n_ip")).cast("long").as("ips"),
        sum(col("chars_delta")).cast("long").as("chars_redacted"))
      .withColumn("pii_rate",
        round(col("docs_flagged").cast("double") / col("docs"), 6))
  }

  /** Oracle CTE body ending in `scored(doc_id, source, n_email,
    * n_phone, n_ip, chars_delta)` — the SQL mirror of [[piiPerDoc]],
    * shared by [[qPiiScanSql]] and the K25 funnel oracle.
    */
  private[operators] val piiScoredCte: String = {
    val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val ipRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val allRe = s"($emailRe|$phoneRe|$ipRe)"
    // NOTE: no continuation line may BEGIN with "||" — this CTE body
    // is interpolated into callers' raw strings whose own stripMargin
    // would eat the first bar of a leading concat operator
    raw"""aug AS (SELECT doc_id, source, text ||
         |    (CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||
         |        CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) ||
         |    (CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' ||
         |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
         |    (CASE WHEN doc_id % 11 = 0 THEN ' host 10.' ||
         |        CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |        CAST((doc_id // 7) % 256 AS VARCHAR) || '.' ||
         |        CAST((doc_id // 13) % 256 AS VARCHAR) ELSE '' END)
         |    AS aug
         |  FROM documents),
         |scored AS (SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(aug, '$emailRe')) AS BIGINT) AS n_email,
         |    CAST(len(regexp_extract_all(aug, '$phoneRe')) AS BIGINT) AS n_phone,
         |    CAST(len(regexp_extract_all(aug, '$ipRe')) AS BIGINT) AS n_ip,
         |    CAST(length(aug) - length(regexp_replace(aug, '$allRe', '[PII]', 'g'))
         |      AS BIGINT) AS chars_delta
         |  FROM aug)""".stripMargin
  }

  val qPiiScanSql: String =
    raw"""WITH $piiScoredCte
         |SELECT source, count(*) AS docs,
         |  CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS docs_flagged,
         |  CAST(sum(n_email) AS BIGINT) AS emails,
         |  CAST(sum(n_phone) AS BIGINT) AS phones,
         |  CAST(sum(n_ip) AS BIGINT) AS ips,
         |  CAST(sum(chars_delta) AS BIGINT) AS chars_redacted,
         |  round(CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1
         |      ELSE 0 END) AS DOUBLE) / count(*), 6) AS pii_rate
         |FROM scored GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- B25
  /** First three BPE merge operations over the corpus vocabulary —
    * tokenizer INDUCTION, the step every surprisal/fertility operator
    * (B9/B11/B17) consumes a finished tokenizer for. Classic
    * byte-pair encoding unrolled three rounds, engine-exact:
    * letters-only word TYPES with corpus frequencies (the Heaps-
    * bounded vocabulary table, never corpus tokens), adjacent-symbol
    * pair counts as exact integer sums, argmax merge per round with
    * (count DESC, lhs ASC, rhs ASC) ties, then the merge applied to
    * every word's symbol string. Merge application is a plain
    * left-to-right string replace made BOUNDARY-SAFE by the
    * two-space device: symbols are rendered " a  b  c " (every char
    * → " c ", so adjacent symbols are separated by TWO spaces and
    * the string is edge-padded); the pattern " lhs  rhs " consumes
    * one space from each flanking separator and the replacement
    * " lhsrhs " restores it, so (1) a pattern can never match a
    * symbol's affix (symbols contain no spaces), and (2) consecutive
    * occurrences " a  b  a  b " both merge — the naive single-space
    * encoding loses the second match to the consumed boundary, and
    * RE2 (DuckDB) has no lookahead to anchor with. Both engines'
    * replace() scans left-to-right over identical strings →
    * identical merges, identical counts. Scale: the word-type table
    * is vocabulary-bounded (Heaps' law), each round is one bounded
    * aggregate + a map-side replace; nothing corpus-scale moves
    * after the first token explode.
    */
  /** Shared BPE induction state: the word-type table after the three
    * learned merges (w, c, sp) and the three 1-row merge descriptors.
    * [[qBpeMerges]] publishes the merges; [[qBpeApply]] joins the
    * merged symbol table back onto the corpus.
    */
  private def bpeState(spark: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    val words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("sp", regexp_replace(col("w"), "(.)", " $1 "))
      .cache()
    def pairs(df: DataFrame): DataFrame =
      df.select(col("c"), split(trim(col("sp")), "\\s+").as("s"))
        // Spark's sequence(1, 0) would yield [1, 0] (descending) for
        // single-symbol words — filter them out before the transform
        .filter(size(col("s")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(s[i-1] AS l, s[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("c")).as("pair_count"))
    def argmax(pc: DataFrame, round: Int): DataFrame =
      pc.orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .select(lit(round).as("round"), col("lhs"), col("rhs"),
          concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
    def applyMerge(df: DataFrame, m: DataFrame): DataFrame =
      df.crossJoin(broadcast(m.select(col("lhs").as("ml"), col("rhs").as("mr"))))
        .withColumn("sp", expr(
          "replace(sp, concat(' ', ml, '  ', mr, ' '), concat(' ', ml, mr, ' '))"))
        .select(col("w"), col("c"), col("sp"))
    val m1 = argmax(pairs(words), 1)
    val w1 = applyMerge(words, m1)
    val m2 = argmax(pairs(w1), 2)
    val w2 = applyMerge(w1, m2)
    val m3 = argmax(pairs(w2), 3)
    val w3 = applyMerge(w2, m3)
    (w3, Seq(m1, m2, m3))
  }

  def qBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (_, merges) = bpeState(spark, dir)
    merges.reduce(_ union _)
  }

  /** Shared WITH-prefix of the BPE oracle: word-type table w0 and the
    * three unrolled merge rounds (CTEs m1–m3, w1–w3). One BPE round =
    * symbol split, adjacent-pair counts, argmax merge, merge applied
    * via the two-space-safe replace.
    */
  private def bpeSqlCtes: String = {
    def round(prev: String, k: Int): String =
      s"""sym$k AS (SELECT c, regexp_split_to_array(trim(sp), ' +') AS s
         |  FROM $prev),
         |si$k AS (SELECT c, s, unnest(generate_series(1, len(s) - 1)) AS i
         |  FROM sym$k WHERE len(s) >= 2),
         |p$k AS (SELECT s[i] AS lhs, s[i + 1] AS rhs,
         |    CAST(sum(c) AS BIGINT) AS pair_count
         |  FROM si$k GROUP BY 1, 2),
         |m$k AS (SELECT $k AS round, lhs, rhs, lhs || rhs AS merged,
         |    pair_count
         |  FROM p$k ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
         |w$k AS (SELECT w, c, replace(sp,
         |    concat(' ', (SELECT lhs FROM m$k), '  ', (SELECT rhs FROM m$k),
         |      ' '),
         |    concat(' ', (SELECT merged FROM m$k), ' ')) AS sp
         |  FROM $prev)""".stripMargin
    val toksSql = duckToksSql("text")
    s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
       |w0 AS (SELECT w, count(*) AS c,
       |    regexp_replace(w, '(.)', ' \\1 ', 'g') AS sp
       |  FROM toks WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |${round("w0", 1)},
       |${round("w1", 2)},
       |${round("w2", 3)}""".stripMargin
  }

  val qBpeMergesSql: String =
    s"""$bpeSqlCtes
       |SELECT round, lhs, rhs, merged, pair_count FROM m1
       |UNION ALL SELECT round, lhs, rhs, merged, pair_count FROM m2
       |UNION ALL SELECT round, lhs, rhs, merged, pair_count FROM m3"""
      .stripMargin

  // ---------------------------------------------------------------- B26
  /** The learned BPE tokenizer APPLIED corpus-wide — the per-source
    * fertility/compression readout a tokenizer change is judged by
    * (B17 measures a fixed whitespace tokenizer; this measures the
    * induced one). The B25 merge chain runs once on the vocabulary;
    * the corpus pass is then ONE map-side explode joined to the
    * BROADCAST merged symbol table (vocab-bounded — never a shuffle
    * of text), aggregated per source: word instances, characters,
    * post-merge tokens, and the two half-up ppm ratios (tokens/word
    * fertility, tokens/char compression — exact integers end-to-end).
    * Non-letter tokens are outside the induction scope and excluded
    * on both sides (inner join = the oracle's inner join).
    */
  def qBpeApply(spark: SparkSession, dir: String): DataFrame = {
    val (w3, _) = bpeState(spark, dir)
    val vocab = w3.select(col("w"),
      size(split(trim(col("sp")), "\\s+")).cast("long").as("n_sym"),
      length(col("w")).cast("long").as("n_chr"))
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(vocab), "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chr")).cast("long").as("n_chars"),
        sum(col("n_sym")).cast("long").as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        expr("(2 * 1000000 * n_tokens + n_words) DIV (2 * n_words)")
          .as("fertility_ppm"),
        expr("(2 * 1000000 * n_tokens + n_chars) DIV (2 * n_chars)")
          .as("compression_ppm"))
  }

  val qBpeApplySql: String =
    s"""$bpeSqlCtes,
       |vocab AS (SELECT w,
       |    CAST(len(regexp_split_to_array(trim(sp), ' +')) AS BIGINT)
       |      AS n_sym,
       |    CAST(length(w) AS BIGINT) AS n_chr
       |  FROM w3),
       |dw AS (SELECT source, unnest(${duckToksSql("text")}) AS w
       |  FROM documents),
       |agg AS (SELECT source, count(*) AS n_words,
       |    CAST(sum(n_chr) AS BIGINT) AS n_chars,
       |    CAST(sum(n_sym) AS BIGINT) AS n_tokens
       |  FROM dw JOIN vocab USING (w) GROUP BY source)
       |SELECT source, n_words, n_chars, n_tokens,
       |  CAST((2 * 1000000 * n_tokens + n_words) // (2 * n_words)
       |    AS BIGINT) AS fertility_ppm,
       |  CAST((2 * 1000000 * n_tokens + n_chars) // (2 * n_chars)
       |    AS BIGINT) AS compression_ppm
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- B31
  /** Unigram-LM (SentencePiece-style) tokenizer induction — B25's
    * probabilistic sibling (r15 VERDICT ask #5; Kudo 2018): where BPE
    * greedily MERGES, the unigram LM starts from a seeded piece
    * vocabulary and lets hard-EM keep the pieces the corpus actually
    * segments with. Engine-exact unroll, all on word TYPES (the
    * Heaps-bounded vocabulary, never corpus tokens):
    *
    *  - SEED (round 0): every substring of length ≤ [[UniMaxPiece]]
    *    of every ≤ [[UniMaxWordLen]]-char word type, frequency-
    *    weighted; the piece set = ALL single chars (the coverage
    *    floor that guarantees every word segments in every round) +
    *    the top-[[UniSeedK]] multi-char substrings by (mass DESC,
    *    piece ASC). Piece log-probs µ-quantize ONE ln of ONE double
    *    division of exact integers (the E33 device) — so the whole
    *    segmentation lattice runs on exact LONG scores.
    *  - EM ROUND r (hard-EM = Viterbi, the standard practical
    *    variant): each word's best segmentation maximizes Σ lp_µ over
    *    a BOUNDED per-word lattice (≤ UniMaxWordLen positions ×
    *    UniMaxPiece piece lengths), computed per word inside ONE
    *    bounded HOF `aggregate` (no join-per-position, no plan
    *    growth: acc = array of (best score, backpointer) structs;
    *    integers make the max exact, ties break to the SHORTEST
    *    piece — deterministic). Counts from the reconstructed paths
    *    re-estimate probs with add-1 smoothing; PRUNING drops every
    *    multi-char piece Viterbi stopped using (count 0) — single
    *    chars are never pruned.
    *  - Publishes (round, piece, cnt, lp_mu, prob_ppb) for rounds
    *    0/1/2 — exact integers only (prob_ppb via the half-up DIV
    *    device on DECIMAL(38,0)/HUGEINT).
    *
    * Oracle: the identical arithmetic with different mechanics — the
    * DP unrolls to one CTE per position (max over candidate
    * back-edges via `first(s ORDER BY s DESC, k ASC)`), path
    * reconstruction to one CTE per step; machine-generated like
    * [[bpeSqlCtes]]. 100 TB shape: everything after the one token
    * explode is vocabulary-keyed; the lattice is O(types · 16 · 4);
    * piece tables are ≤ (alphabet + UniSeedK) rows and broadcast.
    */
  private val UniMaxWordLen = 16
  private val UniMaxPiece = 4
  private val UniSeedK = 24

  /** ≤16-char letters-only word types with corpus frequencies.
    * The rlike gate runs AFTER the type aggregate (r17): per-token it
    * cost one regex match per corpus word occurrence; per-TYPE it
    * costs one per distinct word — ~100× fewer matches for the same
    * kept set and identical counts (the aggregate is scope-neutral:
    * filtering non-matching types before or after counting cannot
    * change the counts of the types that survive).
    */
  private def uniWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")) <= UniMaxWordLen)
      .cache()

  /** One row per (word, end position i, piece length k): the piece
    * substring and its i*10+k lattice key.
    */
  private def uniGrid(words: DataFrame): DataFrame =
    // two chained explode(sequence(...)) generators + a built-in
    // substring — the same (key, p) rows the previous nested-HOF
    // flatten(transform(transform)) emitted, but generated entirely
    // inside whole-stage codegen (array-HOF lambdas run interpreted
    // per element, and this explode is the unigram chain's most
    // expensive leaf — r17 VERDICT ask #4)
    words
      .select(col("w"), col("c"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("c"), col("i"),
        explode(sequence(lit(1), least(lit(UniMaxPiece), col("i")))).as("k"))
      .select(col("w"), col("c"),
        (col("i") * 10 + col("k")).as("key"),
        expr("substring(w, i - k + 1, k)").as("p"))
      // cached (r17): a pure function of the cached word-type frame,
      // re-evaluated by the seed-piece aggregate AND every Viterbi
      // round (3-4× per unigram query) — the nested-HOF lattice
      // explode runs interpreted lambdas, so re-derivation is the
      // single most expensive leaf of the chain. Identical plans
      // share one CacheManager entry across the rounds.
      .cache()

  /** Attach µ-log-probs and ppb probabilities to a counted piece set:
    * lp_µ = round(ln((cnt+smooth)/Σ(cnt+smooth))·10⁶),
    * prob_ppb = half-up 10⁹·(cnt+smooth)/Σ.
    */
  private def uniProbs(pieces: DataFrame, smooth: Int): DataFrame = {
    val tot = pieces.agg(sum(col("cnt") + smooth).cast("long").as("s"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log((col("cnt") + smooth).cast("double") /
          col("s").cast("double")) * 1e6).cast("long").as("lp_mu"),
        expr(s"CAST((2 * CAST(cnt + $smooth AS DECIMAL(38,0)) * 1000000000" +
          " + s) DIV (2 * CAST(s AS DECIMAL(38,0))) AS BIGINT)")
          .as("prob_ppb"))
      .cache()
  }

  /** Viterbi-segment every word under the given piece log-probs.
    * Returns (w, c, ps) where ps is the best path's piece array
    * (emitted back-to-front; order is irrelevant to every consumer).
    * The DP and the path walk each run inside one bounded HOF
    * `aggregate` — exact LONG scores, shortest-piece tie-break.
    */
  private def uniViterbi(words: DataFrame, pieces: DataFrame): DataFrame = {
    def s(k: Int): String =
      s"IF($k <= i, element_at(acc, i - ${k - 1}).b" +
        s" + element_at(m, i * 10 + $k), CAST(NULL AS BIGINT))"
    val g = (1 to UniMaxPiece).map(s).mkString("greatest(", ", ", ")")
    val kCase = (1 until UniMaxPiece)
      .map(k => s"WHEN ${s(k)} = $g THEN $k").mkString(" ")
    val dpExpr =
      s"""aggregate(sequence(1, length(w)),
         |  array(named_struct('b', CAST(0 AS BIGINT), 'k', 0)),
         |  (acc, i) -> acc || array(named_struct('b', $g,
         |    'k', CASE $kCase ELSE $UniMaxPiece END)))"""
        .stripMargin.replace("\n", " ")
    val pathExpr =
      s"""aggregate(sequence(1, length(w)),
         |  named_struct('pos', length(w), 'ps', CAST(array() AS array<string>)),
         |  (st, t) -> IF(st.pos > 0, named_struct(
         |    'pos', st.pos - element_at(dp, st.pos + 1).k,
         |    'ps', st.ps || array(substring(w,
         |      st.pos - element_at(dp, st.pos + 1).k + 1,
         |      element_at(dp, st.pos + 1).k))), st),
         |  st -> st.ps)"""
        .stripMargin.replace("\n", " ")
    uniGrid(words)
      .join(broadcast(pieces.select(col("piece").as("p"), col("lp_mu"))),
        Seq("p"))
      .groupBy(col("w"), col("c"))
      .agg(map_from_entries(collect_list(struct(col("key"), col("lp_mu"))))
        .as("m"))
      .withColumn("dp", expr(dpExpr))
      .withColumn("ps", expr(pathExpr))
      .select(col("w"), col("c"), col("ps"))
  }

  /** One hard-EM round: Viterbi counts under `prev`, then pruning —
    * multi-char pieces with count 0 drop, single chars always stay.
    */
  private def uniRound(words: DataFrame, prev: DataFrame): DataFrame = {
    val cnts = uniViterbi(words, prev)
      .select(col("c"), explode(col("ps")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("c")).as("vc"))
    val retained = prev.select(col("piece"))
      .join(cnts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("vc"), lit(0L)).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") > 0)
    uniProbs(retained, smooth = 1)
  }

  /** Piece tables for rounds 0 (seed), 1 and 2. */
  private def uniState(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val words = uniWords(spark, dir)
    val sub = uniGrid(words).groupBy(col("p").as("piece"))
      .agg(sum(col("c")).as("cnt"))
    val chars = sub.filter(length(col("piece")) === 1)
    val multi = sub.filter(length(col("piece")) >= 2)
      .withColumn("r", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece").asc)))
      .filter(col("r") <= UniSeedK).drop("r")
    val p0 = uniProbs(chars.unionAll(multi), smooth = 0)
    val p1 = uniRound(words, p0)
    val p2 = uniRound(words, p1)
    (words, p0, p1, p2)
  }

  def qUnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val (_, p0, p1, p2) = uniState(spark, dir)
    Seq(p0 -> 0, p1 -> 1, p2 -> 2).map { case (p, r) =>
      p.select(lit(r).as("round"), col("piece"), col("cnt"),
        col("lp_mu"), col("prob_ppb"))
    }.reduce(_ unionAll _)
  }

  // ---------------------------------------------------------------- B32
  /** The induced unigram LM APPLIED corpus-wide, against BPE — the
    * B26 readout for B31 plus the comparison the ask is really
    * about: does 2-round hard-EM beat 3-merge BPE on fertility?
    * One corpus explode joins ONE broadcast vocabulary frame carrying
    * BOTH tokenizers' per-word piece counts (unigram = the round-2
    * Viterbi path length; BPE = B25's merged symbol count), so the
    * comparison is a single aggregate per source: word instances,
    * both token totals, both half-up fertility ppms (DECIMAL-lifted —
    * 2·10⁶·tokens wraps LONG at extreme corpus sizes), and their
    * delta. Application scope = induction scope ∩ B25's (letters-only
    * AND ≤ 16 chars), enforced by the inner joins on both sides.
    */
  def qUnigramApply(spark: SparkSession, dir: String): DataFrame = {
    val (words, _, _, p2) = uniState(spark, dir)
    val seg = uniViterbi(words, p2)
      .select(col("w"), size(col("ps")).cast("long").as("n_uni"))
    val (w3, _) = bpeState(spark, dir)
    val bv = w3.select(col("w"),
      size(split(trim(col("sp")), "\\s+")).cast("long").as("n_bpe"))
    val vocab = seg.join(bv, "w")
    def fert(tokens: String): Column =
      expr(s"CAST((2 * CAST($tokens AS DECIMAL(38,0)) * 1000000 + n_words)" +
        " DIV (2 * CAST(n_words AS DECIMAL(38,0))) AS BIGINT)")
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(vocab), "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_uni")).cast("long").as("n_tokens_uni"),
        sum(col("n_bpe")).cast("long").as("n_tokens_bpe"))
      .select(col("source"), col("n_words"), col("n_tokens_uni"),
        col("n_tokens_bpe"),
        fert("n_tokens_uni").as("fertility_uni_ppm"),
        fert("n_tokens_bpe").as("fertility_bpe_ppm"))
      .withColumn("delta_ppm",
        col("fertility_uni_ppm") - col("fertility_bpe_ppm"))
  }

  // ---------------------------------------------------------------- B34
  /** Gopher-style quality-rule battery (Rae et al. 2021 §A1.1) — the
    * published rule set large-scale text curation actually runs,
    * complementing B3's continuous score with hard pass/fail gates:
    * word count ∈ [50, 10⁵], mean word length ∈ [3, 10], symbol-to-
    * word ratio ≤ 0.1 (# and … marks), ≥ 80 % alphabetic words,
    * ≥ 2 stopwords (the B3 list), bullet-line ratio ≤ 0.9 and
    * ellipsis-line ratio ≤ 0.3. EVERY rule is a pure integer
    * comparison (mean-length ∈ [3,10] ⟺ 3n ≤ Σlen ≤ 10n; ratio
    * cuts cross-multiplied) — no float enters a verdict. Map-only
    * per-doc bits → ONE per-source aggregate of rule pass counts +
    * the all-rules pass rate (half-up ppm). On the synthetic corpus
    * the symbol/bullet/ellipsis rules pass vacuously (no such marks
    * — spec-pinned); word-count and stopword rules discriminate.
    */
  def qGopherRules(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{normText, segmentText}
    val toks = tokens(col("text"))
    val bits = Tables.documents(spark, dir).select(col("source"),
      size(toks).cast("long").as("nw"),
      length(regexp_replace(normText(segmentText(col("text"))), " ", ""))
        .cast("long").as("sumlen"),
      vocabHits(toks, stopwords("en")).cast("long").as("nstop"),
      size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("nalpha"),
      (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
        .cast("long").as("nhash"),
      expr("(length(text) - length(replace(text, '...', ''))) DIV 3")
        .as("nellip"),
      expr("size(split(text, '\n'))").cast("long").as("nlines"),
      expr("size(filter(split(text, '\n'), l -> " +
        "startswith(ltrim(l), '- ') OR startswith(ltrim(l), '* ')))")
        .cast("long").as("nbullet"),
      expr("size(filter(split(text, '\n'), l -> " +
        "endswith(rtrim(l), '...')))").cast("long").as("nellipl"))
      .select(col("source"),
        (col("nw") >= 50 && col("nw") <= 100000).as("r_wc"),
        (col("sumlen") >= col("nw") * 3 &&
          col("sumlen") <= col("nw") * 10).as("r_mwl"),
        ((col("nhash") + col("nellip")) * 10 <= col("nw")).as("r_sym"),
        (col("nalpha") * 5 >= col("nw") * 4).as("r_alpha"),
        (col("nstop") >= 2).as("r_stop"),
        (col("nbullet") * 10 <= col("nlines") * 9).as("r_bullet"),
        (col("nellipl") * 10 <= col("nlines") * 3).as("r_ellip"))
    val rules = Seq("r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop",
      "r_bullet", "r_ellip")
    val passAll = rules.map(col).reduce(_ && _)
    bits.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (rules.map(r => sum(when(col(r), 1L).otherwise(0L)).cast("long")
          .as(s"n_$r")) :+
          sum(when(passAll, 1L).otherwise(0L)).cast("long")
            .as("n_pass")): _*)
      .withColumn("pass_ppm", expr(
        "CAST((2 * CAST(n_pass AS DECIMAL(38,0)) * 1000000 + n_docs)" +
          " DIV (2 * CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)"))
  }

  val qGopherRulesSql: String = {
    val toksE = duckToks
    val norm = graft.functions.TextFunctions.normSegSql("text")
    s"""WITH bits AS (SELECT source,
       |    CAST(len($toksE) AS BIGINT) AS nw,
       |    CAST(length(regexp_replace($norm, ' ', '', 'g')) AS BIGINT)
       |      AS sumlen,
       |    CAST(len(list_filter($toksE,
       |      t -> list_contains($stopSqlEn, t))) AS BIGINT) AS nstop,
       |    CAST(len(list_filter($toksE,
       |      t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS nalpha,
       |    CAST(length(text) - length(regexp_replace(text, '#', '', 'g'))
       |      AS BIGINT) AS nhash,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3
       |      AS BIGINT) AS nellip,
       |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS nlines,
       |    CAST(len(list_filter(string_split(text, chr(10)), l ->
       |      starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* ')))
       |      AS BIGINT) AS nbullet,
       |    CAST(len(list_filter(string_split(text, chr(10)), l ->
       |      ends_with(rtrim(l), '...'))) AS BIGINT) AS nellipl
       |  FROM documents),
       |rb AS (SELECT source,
       |    (nw >= 50 AND nw <= 100000) AS r_wc,
       |    (sumlen >= nw * 3 AND sumlen <= nw * 10) AS r_mwl,
       |    ((nhash + nellip) * 10 <= nw) AS r_sym,
       |    (nalpha * 5 >= nw * 4) AS r_alpha,
       |    (nstop >= 2) AS r_stop,
       |    (nbullet * 10 <= nlines * 9) AS r_bullet,
       |    (nellipl * 10 <= nlines * 3) AS r_ellip
       |  FROM bits),
       |agg AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_r_wc,
       |    CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_r_mwl,
       |    CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_r_sym,
       |    CAST(sum(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_r_alpha,
       |    CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_r_stop,
       |    CAST(sum(CASE WHEN r_bullet THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_r_bullet,
       |    CAST(sum(CASE WHEN r_ellip THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_r_ellip,
       |    CAST(sum(CASE WHEN r_wc AND r_mwl AND r_sym AND r_alpha
       |      AND r_stop AND r_bullet AND r_ellip THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_pass
       |  FROM rb GROUP BY source)
       |SELECT source, n_docs, n_r_wc, n_r_mwl, n_r_sym, n_r_alpha,
       |  n_r_stop, n_r_bullet, n_r_ellip, n_pass,
       |  CAST((2 * CAST(n_pass AS HUGEINT) * 1000000 + n_docs)
       |    // (2 * CAST(n_docs AS HUGEINT)) AS BIGINT) AS pass_ppm
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- B33
  /** Hapax/dis-legomena audit per source — the vocabulary-growth
    * readout behind B18's Zipf fit and every dedup-threshold choice:
    * the share of word TYPES seen exactly once (hapax) or twice (dis)
    * is the classic estimator of how much vocabulary is still unseen
    * (Good–Turing mass ≈ hapax instances / tokens) and the first
    * number that moves when boilerplate or near-duplicates inflate a
    * source. Letters-only scope (the B25/B31 induction scope). All
    * exact integers: per-(source, type) counts → per-source type/
    * token/hapax/dis totals → half-up ppm ratios (hapax share of
    * types, hapax mass = Good–Turing unseen-mass proxy, type–token
    * ratio). Two keyed aggregates; output |sources| rows.
    */
  def qHapax(spark: SparkSession, dir: String): DataFrame = {
    val tw = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    def ppm(num: String, den: String): Column =
      expr(s"CAST((2 * CAST($num AS DECIMAL(38,0)) * 1000000 + $den)" +
        s" DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT)")
    tw.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).cast("long")
          .as("n_dis"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("n_dis"),
        ppm("n_hapax", "n_types").as("hapax_type_ppm"),
        ppm("n_hapax", "n_tokens").as("gt_unseen_ppm"),
        ppm("n_types", "n_tokens").as("ttr_ppm"))
  }

  val qHapaxSql: String =
    s"""WITH tw AS (SELECT source, w, count(*) AS c FROM (
       |    SELECT source, unnest(${duckToksSql("text")}) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY source, w),
       |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    count(*) AS n_types,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hapax,
       |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dis
       |  FROM tw GROUP BY source)
       |SELECT source, n_tokens, n_types, n_hapax, n_dis,
       |  CAST((2 * CAST(n_hapax AS HUGEINT) * 1000000 + n_types)
       |    // (2 * CAST(n_types AS HUGEINT)) AS BIGINT) AS hapax_type_ppm,
       |  CAST((2 * CAST(n_hapax AS HUGEINT) * 1000000 + n_tokens)
       |    // (2 * CAST(n_tokens AS HUGEINT)) AS BIGINT) AS gt_unseen_ppm,
       |  CAST((2 * CAST(n_types AS HUGEINT) * 1000000 + n_tokens)
       |    // (2 * CAST(n_tokens AS HUGEINT)) AS BIGINT) AS ttr_ppm
       |FROM agg""".stripMargin

  /** Half-up ppb/µln attachment CTEs for a counted piece set — the
    * DuckDB mirror of [[uniProbs]].
    */
  private def uniProbsCte(out: String, in: String, smooth: Int): String =
    s"""${out}_s AS MATERIALIZED (SELECT CAST(sum(cnt + $smooth) AS BIGINT) AS s FROM $in),
       |$out AS MATERIALIZED (SELECT p, cnt,
       |    CAST(round(ln(CAST(cnt + $smooth AS DOUBLE) / CAST(s AS DOUBLE))
       |      * 1000000) AS BIGINT) AS lp,
       |    CAST((2 * CAST(cnt + $smooth AS HUGEINT) * 1000000000 + s)
       |      // (2 * CAST(s AS HUGEINT)) AS BIGINT) AS prob_ppb
       |  FROM $in, ${out}_s)""".stripMargin

  /** DuckDB mirror of [[uniViterbi]]: the DP unrolled to one CTE per
    * position (candidates = back-edges into the ≤4 previous best
    * rows; max-score/shortest-piece via ordered `first`), the path
    * walk to one CTE per step. Emits CTEs suffixed `_tag`; exposes
    * `pcs_tag(w, c, piece)` — one row per Viterbi path element.
    */
  private def uniViterbiCtes(tag: String, pieces: String): String = {
    val lut =
      s"""lut_$tag AS MATERIALIZED (SELECT g.w, g.c, g.i, g.k, pc.lp
         |  FROM u_gik g JOIN $pieces pc
         |    ON pc.p = substr(g.w, g.i - g.k + 1, g.k))""".stripMargin
    val b0 = s"b_${tag}_0 AS MATERIALIZED (SELECT w, 0 AS i, CAST(0 AS BIGINT) AS b FROM u_w)"
    val steps = (1 to UniMaxWordLen).map { i =>
      val prevUnion = (math.max(0, i - UniMaxPiece) until i)
        .map(j => s"SELECT w, i, b FROM b_${tag}_$j")
        .mkString(" UNION ALL ")
      s"""c_${tag}_$i AS MATERIALIZED (SELECT l.w, l.k, pv.b + l.lp AS s
         |  FROM lut_$tag l JOIN ($prevUnion) pv
         |    ON pv.w = l.w AND pv.i = $i - l.k
         |  WHERE l.i = $i),
         |b_${tag}_$i AS MATERIALIZED (SELECT w, $i AS i,
         |    first(s ORDER BY s DESC, k ASC) AS b,
         |    first(k ORDER BY s DESC, k ASC) AS bk
         |  FROM c_${tag}_$i GROUP BY w)""".stripMargin
    }
    val kk = s"kk_$tag AS MATERIALIZED (" + (1 to UniMaxWordLen)
      .map(i => s"SELECT w, i, bk FROM b_${tag}_$i")
      .mkString(" UNION ALL ") + ")"
    val pth0 = s"pth_${tag}_0 AS MATERIALIZED (SELECT w, c, length(w) AS pos FROM u_w)"
    val pths = (1 to UniMaxWordLen).map { t =>
      s"""pth_${tag}_$t AS MATERIALIZED (SELECT p.w, p.c, p.pos - k.bk AS pos,
         |    substr(p.w, p.pos - k.bk + 1, k.bk) AS piece
         |  FROM pth_${tag}_${t - 1} p JOIN kk_$tag k
         |    ON k.w = p.w AND k.i = p.pos
         |  WHERE p.pos > 0)""".stripMargin
    }
    val pcs = s"pcs_$tag AS MATERIALIZED (" + (1 to UniMaxWordLen)
      .map(t => s"SELECT w, c, piece FROM pth_${tag}_$t")
      .mkString(" UNION ALL ") + ")"
    (Seq(lut, b0) ++ steps ++ Seq(kk, pth0) ++ pths :+ pcs).mkString(",\n")
  }

  /** One hard-EM round in SQL: Viterbi counts under `prevPieces`,
    * pruning, re-estimated probs into CTE `out`.
    */
  private def uniRoundCtes(tag: String, prevPieces: String,
      out: String): String =
    s"""${uniViterbiCtes(tag, prevPieces)},
       |cnt_$tag AS MATERIALIZED (SELECT piece AS p, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM pcs_$tag GROUP BY 1),
       |ret_$tag AS MATERIALIZED (SELECT pv.p, coalesce(ct.cnt, 0) AS cnt
       |  FROM $prevPieces pv LEFT JOIN cnt_$tag ct USING (p)
       |  WHERE length(pv.p) = 1 OR coalesce(ct.cnt, 0) > 0),
       |${uniProbsCte(out, s"ret_$tag", 1)}""".stripMargin

  /** Bare CTE list (no WITH) of the full B31 induction: seed, two EM
    * rounds, piece tables pp0/pp1/pp2.
    */
  private def uniSqlCtes: String =
    s"""u_toks AS (SELECT unnest(${duckToksSql("text")}) AS w FROM documents),
       |u_w AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c FROM u_toks
       |  WHERE regexp_matches(w, '^[a-z]+$$')
       |    AND length(w) <= $UniMaxWordLen GROUP BY w),
       |u_gi AS (SELECT w, c, unnest(generate_series(1, length(w))) AS i
       |  FROM u_w),
       |u_gik AS MATERIALIZED (SELECT w, c, i,
       |    unnest(generate_series(1, least($UniMaxPiece, i))) AS k
       |  FROM u_gi),
       |u_sub AS MATERIALIZED (SELECT substr(w, i - k + 1, k) AS p,
       |    CAST(sum(c) AS BIGINT) AS cnt
       |  FROM u_gik GROUP BY 1),
       |u_p0 AS MATERIALIZED (SELECT p, cnt FROM u_sub WHERE length(p) = 1
       |  UNION ALL
       |  SELECT p, cnt FROM (SELECT p, cnt, row_number() OVER (
       |      ORDER BY cnt DESC, p ASC) AS r FROM u_sub
       |    WHERE length(p) >= 2) WHERE r <= $UniSeedK),
       |${uniProbsCte("pp0", "u_p0", 0)},
       |${uniRoundCtes("r1", "pp0", "pp1")},
       |${uniRoundCtes("r2", "pp1", "pp2")}""".stripMargin

  val qUnigramLmSql: String =
    s"""WITH $uniSqlCtes
       |SELECT 0 AS round, p AS piece, cnt, lp AS lp_mu, prob_ppb FROM pp0
       |UNION ALL
       |SELECT 1 AS round, p, cnt, lp, prob_ppb FROM pp1
       |UNION ALL
       |SELECT 2 AS round, p, cnt, lp, prob_ppb FROM pp2""".stripMargin

  val qUnigramApplySql: String =
    s"""$bpeSqlCtes,
       |$uniSqlCtes,
       |${uniViterbiCtes("ap", "pp2")},
       |useg AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n_uni
       |  FROM pcs_ap GROUP BY w),
       |ubv AS (SELECT w,
       |    CAST(len(regexp_split_to_array(trim(sp), ' +')) AS BIGINT)
       |      AS n_bpe
       |  FROM w3),
       |uvocab AS (SELECT w, n_uni, n_bpe FROM useg JOIN ubv USING (w)),
       |udw AS (SELECT source, unnest(${duckToksSql("text")}) AS w
       |  FROM documents),
       |uagg AS (SELECT source, count(*) AS n_words,
       |    CAST(sum(n_uni) AS BIGINT) AS n_tokens_uni,
       |    CAST(sum(n_bpe) AS BIGINT) AS n_tokens_bpe
       |  FROM udw JOIN uvocab USING (w) GROUP BY source),
       |usel AS (SELECT source, n_words, n_tokens_uni, n_tokens_bpe,
       |    CAST((2 * CAST(n_tokens_uni AS HUGEINT) * 1000000 + n_words)
       |      // (2 * CAST(n_words AS HUGEINT)) AS BIGINT)
       |      AS fertility_uni_ppm,
       |    CAST((2 * CAST(n_tokens_bpe AS HUGEINT) * 1000000 + n_words)
       |      // (2 * CAST(n_words AS HUGEINT)) AS BIGINT)
       |      AS fertility_bpe_ppm
       |  FROM uagg)
       |SELECT source, n_words, n_tokens_uni, n_tokens_bpe,
       |  fertility_uni_ppm, fertility_bpe_ppm,
       |  fertility_uni_ppm - fertility_bpe_ppm AS delta_ppm
       |FROM usel""".stripMargin

  // ---------------------------------------------------------------- B28
  /** Kendall's W (1939) — concordance of the three B27 quality raters
    * when they RANK the corpus sources instead of voting per document:
    * B27 answers "do they agree document by document", W answers "do
    * they induce the same SOURCE ordering" — the readout that decides
    * whether a cheap heuristic can stand in for an expensive one at
    * the source-selection level. Each rater scores a source by an
    * exact integer aggregate (Σchars, Σtokens, Σstopword hits), ranks
    * are deterministic row_numbers (score DESC, source ASC — windows
    * PARTITIONED by rater over the |sources|-bounded grid), and with
    * the doubled-deviation device D_i = 2·R_i − m(k+1) the spread
    * ΣD_i² = 4·S is an exact integer, so W = 12S/(m²(k³−k)) =
    * 3·ΣD²/(m²(k³−k)) is ONE double division of exact integers. χ²
    * verdict at m(k−1)·W vs χ²(k−1, .05). One corpus scan; everything
    * after is k-bounded.
    */
  def qKendallW(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(length(col("text")).cast("long")).as("v1"),
        sum(size(tokens(col("text"))).cast("long")).as("v2"),
        sum(vocabHits(tokens(col("text")), stopwords("en")).cast("long"))
          .as("v3"))
    // stack, not union: three union branches would re-run the corpus
    // aggregate three times (measured: 10 exchanges → 4)
    val long = perSource.select(col("source"),
      expr("stack(3, 1, v1, 2, v2, 3, v3)").as(Seq("rater", "v")))
    val w = Window.partitionBy(col("rater"))
      .orderBy(col("v").desc, col("source").asc)
    val ranked = long.withColumn("rk", row_number().over(w))
    val sums = ranked.groupBy(col("source"))
      .agg(sum(col("rk")).as("r"), count(lit(1)).as("m"))
    val kCnt = sums.agg(count(lit(1)).as("k"))
    val withD = sums.crossJoin(broadcast(kCnt))
      .withColumn("d", lit(2) * col("r") - col("m") * (col("k") + 1))
    val agg = withD.agg(max(col("k")).as("k"), max(col("m")).as("m"),
      sum(col("d") * col("d")).as("d2"))
    agg.select(col("k"), col("m"),
        round(col("d2").cast("double") * 3 /
          (col("m").cast("double") * col("m") *
            (col("k").cast("double") * col("k") * col("k") - col("k"))),
          6).as("kendall_w"))
      .withColumn("chi2", round(col("m") * (col("k") - 1) * col("kendall_w"),
        6))
      // r15 (ADVICE): the .05 cut was hardcoded at χ²(19) = 30.144,
      // silently assuming k = 20 sources — derive it from the
      // data-driven k via the shared literal table (the F62 device),
      // identical CASE in both engines; df outside the table → null
      // verdict instead of a silently wrong one
      .withColumn("chi2_crit",
        expr(chi2Crit05Case("k - 1")).cast("double"))
      .withColumn("concordant", col("chi2") > col("chi2_crit"))
  }

  /** χ²(df, .05) upper critical values, df 1..40 — the driver-side
    * literal table the concordance verdict keys on (ADVICE r15: never
    * hardcode one df's cut when df comes from the data). Shared
    * verbatim between the Spark plan and the DuckDB oracle as a
    * simple CASE, so the cut is engine-identical by construction.
    */
  private[graft] val chi2Crit05: Seq[(Int, Double)] = Seq(
    1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488, 5 -> 11.070,
    6 -> 12.592, 7 -> 14.067, 8 -> 15.507, 9 -> 16.919, 10 -> 18.307,
    11 -> 19.675, 12 -> 21.026, 13 -> 22.362, 14 -> 23.685, 15 -> 24.996,
    16 -> 26.296, 17 -> 27.587, 18 -> 28.869, 19 -> 30.144, 20 -> 31.410,
    21 -> 32.671, 22 -> 33.924, 23 -> 35.172, 24 -> 36.415, 25 -> 37.652,
    26 -> 38.885, 27 -> 40.113, 28 -> 41.337, 29 -> 42.557, 30 -> 43.773,
    31 -> 44.985, 32 -> 46.194, 33 -> 47.400, 34 -> 48.602, 35 -> 49.802,
    36 -> 50.998, 37 -> 52.192, 38 -> 53.384, 39 -> 54.572, 40 -> 55.758)

  private[graft] def chi2Crit05Case(dfExpr: String): String =
    s"CASE $dfExpr" +
      chi2Crit05.map { case (d, c) => s" WHEN $d THEN $c" }.mkString +
      " ELSE NULL END"

  val qKendallWSql: String = {
    val toks = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH per_source AS (SELECT source,
      |    CAST(sum(length(text)) AS BIGINT) AS v1,
      |    CAST(sum(len($toks)) AS BIGINT) AS v2,
      |    CAST(sum(len(list_filter($toks, t -> list_contains($stopSqlEn,
      |      t)))) AS BIGINT) AS v3
      |  FROM documents GROUP BY 1),
      |lng AS (SELECT source, 1 AS rater, v1 AS v FROM per_source
      |  UNION ALL SELECT source, 2, v2 FROM per_source
      |  UNION ALL SELECT source, 3, v3 FROM per_source),
      |ranked AS (SELECT source, rater, row_number() OVER (
      |    PARTITION BY rater ORDER BY v DESC, source ASC) AS rk
      |  FROM lng),
      |sums AS (SELECT source, CAST(sum(rk) AS BIGINT) AS r,
      |    CAST(count(*) AS BIGINT) AS m
      |  FROM ranked GROUP BY 1),
      |kk AS (SELECT count(*) OVER () AS k, r, m FROM sums),
      |agg AS (SELECT CAST(max(k) AS BIGINT) AS k, max(m) AS m,
      |    CAST(sum((2 * r - m * (k + 1)) * (2 * r - m * (k + 1)))
      |      AS BIGINT) AS d2
      |  FROM kk),
      |wchi AS (SELECT k, m,
      |    round(CAST(d2 AS DOUBLE) * 3
      |      / (CAST(m AS DOUBLE) * m
      |        * (CAST(k AS DOUBLE) * k * k - k)), 6) AS kendall_w,
      |    round(m * (k - 1) * round(CAST(d2 AS DOUBLE) * 3
      |      / (CAST(m AS DOUBLE) * m
      |        * (CAST(k AS DOUBLE) * k * k - k)), 6), 6) AS chi2
      |  FROM agg)
      |SELECT k, m, kendall_w, chi2,
      |  CAST(${chi2Crit05Case("k - 1")} AS DOUBLE) AS chi2_crit,
      |  (chi2 > CAST(${chi2Crit05Case("k - 1")} AS DOUBLE)) AS concordant
      |FROM wchi""".stripMargin
  }

  // ---------------------------------------------------------------- B27
  /** Fleiss' kappa (1971) — chance-corrected agreement among THREE
    * deterministic quality raters (B21's Cohen kappa compares exactly
    * two): rater 1 accepts on raw length (≥ 500 chars), rater 2 on
    * token count (≥ 80), rater 3 on sentence structure (≥ 3 sentence
    * marks) — the cheap heuristics a curation pipeline actually
    * composes, asked "do they even agree on what a good document
    * is?" (rater 3 reads stopword mass — the corpus ships without
    * sentence punctuation, so a marks-based rater would be constant).
    * ENGINE-EXACT end-to-end: each rater verdict is an integer
    * threshold test, the per-item agreement numerator
    * Σ_i (n_a² + n_r² − m) and the category marginals are exact
    * integer sums, and κ = (P̄−P̄_e)/(1−P̄_e) reduces over the common
    * denominator to (3·A·n − 2·E) / (18·n² − 2·E) with
    * E = c_a² + c_r² — ONE double division of two exact integers
    * (sign-split cast; κ < 0 = worse-than-chance is representable).
    * Unanimous-and-constant corpora hit the 0/0 form and publish
    * null, not a divide error. One corpus scan, one output row.
    */
  def qFleissKappa(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val rated = Tables.documents(spark, dir).select(
      when(length(col("text")) >= 500, 1L).otherwise(0L).as("r1"),
      when(size(tokens(col("text"))) >= 80, 1L).otherwise(0L).as("r2"),
      when(vocabHits(tokens(col("text")), stopwords("en")) >= 5, 1L)
        .otherwise(0L).as("r3"))
      .withColumn("na", col("r1") + col("r2") + col("r3"))
    val d38 = "decimal(38,0)"
    val agg = rated.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("r1")).as("accepts_r1"),
      sum(col("r2")).as("accepts_r2"),
      sum(col("r3")).as("accepts_r3"),
      sum((col("na") * col("na") + (lit(3) - col("na")) * (lit(3) - col("na"))
        - lit(3)).cast(d38)).as("a"),
      sum(col("na").cast(d38)).as("ca"))
    val withE = agg
      .withColumn("e", (col("ca") * col("ca") +
        (lit(3) * col("n") - col("ca")) * (lit(3) * col("n") - col("ca")))
        .cast(d38))
      .withColumn("num", (lit(3) * col("a") * col("n") - lit(2) * col("e"))
        .cast(d38))
      .withColumn("den", (lit(18) * col("n") * col("n") - lit(2) * col("e"))
        .cast(d38))
    val numD = expr("""CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      | ELSE -CAST(-num AS DOUBLE) END""".stripMargin.replace("\n", " "))
    withE.select(col("n").cast("long").as("n_docs"),
        col("accepts_r1"), col("accepts_r2"), col("accepts_r3"),
        round(col("a").cast("double") /
          (col("n").cast("double") * 6), 6).as("p_bar"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(numD / col("den").cast("double"), 6))
          .as("fleiss_kappa"))
      .withColumn("moderate_agreement",
        coalesce(col("fleiss_kappa") > 0.4, lit(false)))
  }

  val qFleissKappaSql: String = {
    val toks = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH rated AS (SELECT
      |    CASE WHEN length(text) >= 500 THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN len($toks) >= 80 THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN len(list_filter($toks, t -> list_contains($stopSqlEn,
      |      t))) >= 5 THEN 1 ELSE 0 END AS r3
      |  FROM documents),
      |wa AS (SELECT r1, r2, r3, r1 + r2 + r3 AS na FROM rated),
      |agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(r1) AS BIGINT) AS accepts_r1,
      |    CAST(sum(r2) AS BIGINT) AS accepts_r2,
      |    CAST(sum(r3) AS BIGINT) AS accepts_r3,
      |    sum(CAST(na * na + (3 - na) * (3 - na) - 3 AS HUGEINT)) AS a,
      |    sum(CAST(na AS HUGEINT)) AS ca
      |  FROM wa),
      |we AS (SELECT *,
      |    ca * ca + (3 * n - ca) * (3 * n - ca) AS e
      |  FROM agg),
      |f AS (SELECT *,
      |    3 * a * n - 2 * e AS num, 18 * n * n - 2 * e AS den
      |  FROM we)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |  accepts_r1, accepts_r2, accepts_r3,
      |  round(CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * 6), 6) AS p_bar,
      |  CASE WHEN den = 0 THEN NULL
      |    ELSE round((CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      |      ELSE -CAST(-num AS DOUBLE) END) / CAST(den AS DOUBLE), 6)
      |    END AS fleiss_kappa,
      |  coalesce((CASE WHEN den = 0 THEN NULL
      |    ELSE round((CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      |      ELSE -CAST(-num AS DOUBLE) END) / CAST(den AS DOUBLE), 6)
      |    END) > 0.4, false) AS moderate_agreement
      |FROM f""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fleiss_kappa" -> (qFleissKappa _),
    "q_kendall_w" -> (qKendallW _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_apply" -> (qBpeApply _),
    "q_unigram_lm" -> (qUnigramLm _),
    "q_unigram_apply" -> (qUnigramApply _),
    "q_hapax" -> (qHapax _),
    "q_gopher_rules" -> (qGopherRules _),
    "q_pii_scan" -> (qPiiScan _),
    "q_mcc" -> (qMcc _),
    "q_cohens_kappa" -> (qCohensKappa _),
    "q_template_score" -> (qTemplateScore _),
    "q_naive_bayes" -> (qNaiveBayes _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_readability" -> (qReadability _),
    "q_keyphrases" -> (qKeyphrases _),
    "q_keep_list" -> (qKeepList _),
    "q_confusion_matrix" -> (qConfusionMatrix _),
    "q_token_count" -> (qTokenCount _),
    "q_regex_tokens" -> (qRegexTokens _),
    "q_tokenizer_fertility" -> (qTokenizerFertility _),
    "q_lang_id" -> (qLangId _),
    "q_quality_score" -> (qQualityScore _),
    "q_preference_pairs" -> (qPreferencePairs _),
    "q_char_entropy" -> (qCharEntropy _),
    "q_fingerprint" -> (qFingerprint _),
    "q_rolling_fingerprint" -> (qRollingFingerprint _),
    "q_stratified_sample" -> (qStratifiedSample _))

  def oracle: Map[String, String] = Map(
    "q_fleiss_kappa" -> qFleissKappaSql,
    "q_kendall_w" -> qKendallWSql,
    "q_bpe_merges" -> qBpeMergesSql,
    "q_bpe_apply" -> qBpeApplySql,
    "q_unigram_lm" -> qUnigramLmSql,
    "q_unigram_apply" -> qUnigramApplySql,
    "q_hapax" -> qHapaxSql,
    "q_gopher_rules" -> qGopherRulesSql,
    "q_pii_scan" -> qPiiScanSql,
    "q_mcc" -> qMccSql,
    "q_cohens_kappa" -> qCohensKappaSql,
    "q_template_score" -> qTemplateScoreSql,
    "q_naive_bayes" -> qNaiveBayesSql,
    "q_inverted_index" -> qInvertedIndexSql,
    "q_readability" -> qReadabilitySql,
    "q_keyphrases" -> qKeyphrasesSql,
    "q_keep_list" -> qKeepListSql,
    "q_confusion_matrix" -> qConfusionMatrixSql,
    "q_token_count" -> qTokenCountSql,
    "q_regex_tokens" -> qRegexTokensSql,
    "q_tokenizer_fertility" -> qTokenizerFertilitySql,
    "q_lang_id" -> qLangIdSql,
    "q_quality_score" -> qQualityScoreSql,
    "q_preference_pairs" -> qPreferencePairsSql,
    "q_char_entropy" -> qCharEntropySql,
    "q_fingerprint" -> qFingerprintSql,
    "q_rolling_fingerprint" -> qRollingFingerprintSql,
    "q_stratified_sample" -> qStratifiedSampleSql)
}
