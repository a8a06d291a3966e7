package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Training-set assembly + monitoring operators (SURVEY.md §2:
  * B8/B9 text-quality extensions, K1/K2 set assembly, F11 events).
  *
  * 100 TB design notes:
  *  - q_repetition: one shuffle on doc_id (window + aggregates share
  *    the key); token/bigram streams never leave their doc partition.
  *  - q_seq_packing: the running token offset is windowed PER SOURCE
  *    SHARD — shard count grows with the corpus, so no global-order
  *    single-partition window ever exists (packing is shard-local by
  *    contract, matching how training shards are materialized).
  *  - q_hash_split: pure map-side arithmetic on md5(doc_id) + one
  *    low-cardinality aggregate — embarrassingly parallel.
  *  - q_unigram_surprisal: the vocabulary aggregate is bounded by
  *    vocab size (not corpus size) and is broadcast back; the token
  *    stream is scored map-side — one shuffle for the vocab count,
  *    one for the per-doc mean.
  *  - q_anomaly: minute-bucket counts partition by event_type; the
  *    trailing-window scan is within-partition, ordered by time.
  */
object TrainingOps {

  private val duckToks =
    graft.functions.TextFunctions.duckToksSql("text")
  private val duckTsSec = "CAST(floor(epoch(ts)) AS BIGINT)"

  // ---------------------------------------------------------------- K37
  /** Corpus novelty curve — the diminishing-returns audit of data
    * acquisition: slice the corpus into ten ingest-order deciles
    * (doc_id as the arrival proxy, the C8 convention) and ask, per
    * slice, how many of its distinct 8-gram windows are seen for the
    * FIRST time there. The curve's decay is the empirical answer to
    * "how much genuinely new text does the next slice of this source
    * actually add" — the question scaling-law data budgets (K33) and
    * dedup inflation audits (C20) bracket from either side. Method:
    * md5 window keys (the C22 device), decile = (doc_id·10) DIV
    * (max_id+1); per (gram, decile) occurrence counts map-side
    * combine BEFORE the one gram-keyed shuffle, the gram's first
    * decile is a min over ≤ 10 cells, and the publish is a 10-row
    * aggregate with exact-integer novelty ppm. Only (16-byte key,
    * decile, count) rows ever shuffle — never text.
    */
  val NoveltyN: Int = 8

  def qNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val n = NoveltyN
    val d38 = "decimal(38,0)"
    val mx = Tables.documents(spark, dir).agg(max(col("doc_id")).as("mxid"))
    val grams = Tables.documents(spark, dir)
      .crossJoin(broadcast(mx))
      .select(expr("least(9, (doc_id * 10) DIV (mxid + 1))").as("dec"),
        tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("dec"),
        explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => md5(concat_ws(" ", slice(col("toks"), i, lit(n)))))).as("g"))
    val gd = grams.groupBy(col("g"), col("dec"))
      .agg(count(lit(1)).as("occ"))
    val fd = gd.groupBy(col("g")).agg(min(col("dec")).as("first_dec"))
    def ppm(num: String, den: String): org.apache.spark.sql.Column =
      expr(s"CAST((2 * CAST($num AS DECIMAL(38,0)) * 1000000 + $den)" +
        s" DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT)")
    gd.join(fd, "g")
      .groupBy(col("dec").as("decile"))
      .agg(sum(col("occ").cast(d38)).cast("long").as("n_occurrences"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("first_dec") === col("dec"), 1L).otherwise(0L))
          .cast("long").as("n_first_seen"))
      .select(col("decile"), col("n_occurrences"), col("n_distinct"),
        col("n_first_seen"), ppm("n_first_seen", "n_distinct").as("novelty_ppm"))
  }

  val qNgramNoveltySql: String = {
    val n = NoveltyN
    raw"""WITH mx AS (SELECT max(doc_id) AS mxid FROM documents),
         |toked AS (SELECT least(9, (doc_id * 10) // (mxid + 1)) AS dec,
         |    $duckToks AS toks
         |  FROM documents, mx),
         |idx AS (SELECT dec, toks,
         |    unnest(generate_series(1, len(toks) - ${n - 1})) AS i
         |  FROM toked WHERE len(toks) >= $n),
         |grams AS (SELECT dec,
         |    md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')) AS g
         |  FROM idx),
         |gd AS (SELECT g, dec, count(*) AS occ FROM grams GROUP BY 1, 2),
         |fd AS (SELECT g, min(dec) AS first_dec FROM gd GROUP BY 1),
         |agg AS (SELECT dec AS decile,
         |    CAST(sum(occ) AS BIGINT) AS n_occurrences,
         |    count(*) AS n_distinct,
         |    CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_first_seen
         |  FROM gd JOIN fd USING (g) GROUP BY 1)
         |SELECT decile, n_occurrences, n_distinct, n_first_seen,
         |  CAST((2 * CAST(n_first_seen AS HUGEINT) * 1000000 + n_distinct)
         |    // (2 * CAST(n_distinct AS HUGEINT)) AS BIGINT) AS novelty_ppm
         |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- K39
  /** Lognormal fit of the per-source document-length distribution —
    * the parametric completion of K27's Heaps fit and K7's quality
    * deciles: document lengths are canonically lognormal-ish, and
    * (µ, σ) of ln(tokens) per source is the two-number summary a
    * mixture designer compares sources by (σ is the spread dial that
    * predicts packing waste K29 measures empirically; a σ far above
    * the corpus's is the "mixed registers in one source" smell).
    * EXACT device: per-doc ln(tokens) µ-quantizes to a long (the
    * E33 device), so Σl and Σl² are exact DECIMAL sums and µ/σ
    * assemble as single fixed-order doubles; the dispersion verdict
    * (σ > 1) uses the published 6-dp value. Map-only + one
    * source-keyed aggregate.
    */
  def qLengthLognormal(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val per = Tables.documents(spark, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("nt"))
      .filter(col("nt") >= 1)
      .withColumn("lmu", round(log(col("nt")) * 1e6).cast("long"))
    val m = per.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("lmu").cast(d38)).as("s"),
        sum(col("lmu").cast(d38) * col("lmu")).as("s2"))
    val varNum = (col("n").cast(d38) * col("s2") - col("s") * col("s"))
    m.filter(col("n") > 1)
      .select(col("source"), col("n").as("n_docs"),
        round(col("s").cast("double") /
          (col("n").cast("double") * 1e6), 6).as("mu_ln"),
        round(sqrt(varNum.cast("double") /
          (col("n").cast("double") * (col("n").cast("double") - 1))) / 1e6,
          6).as("sigma_ln"))
      .withColumn("high_dispersion", col("sigma_ln") > 1.0)
  }

  val qLengthLognormalSql: String =
    raw"""WITH per AS (SELECT source, len($duckToks) AS nt FROM documents),
         |lq AS (SELECT source,
         |    CAST(round(ln(nt) * 1000000) AS BIGINT) AS lmu
         |  FROM per WHERE nt >= 1),
         |m AS (SELECT source, count(*) AS n,
         |    sum(CAST(lmu AS HUGEINT)) AS s,
         |    sum(CAST(lmu AS HUGEINT) * lmu) AS s2
         |  FROM lq GROUP BY 1)
         |SELECT source, n AS n_docs,
         |  round(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS mu_ln,
         |  round(sqrt(CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 1e6, 6)
         |    AS sigma_ln,
         |  (round(sqrt(CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 1e6, 6)
         |    > 1.0) AS high_dispersion
         |FROM m WHERE n > 1""".stripMargin

  // ---------------------------------------------------------------- K38
  /** Span-corruption plan — the T5/UL2 denoising-objective budget,
    * computed per source BEFORE any batch is built: at corruption
    * rate 15% and mean span length 3, each doc of n tokens plans
    * max(1, halfUp(n/20)) spans (n/20 = 0.15·n/3), corrupts
    * min(3·spans, n) tokens, and emits an encoder sequence of
    * n − corrupted + spans sentinels and a decoder sequence of
    * corrupted + spans + 1 tokens — so Σ input and Σ target are the
    * actual seq2seq token bill, and the overhead ppm (input+target
    * vs raw) is what the objective costs over plain LM packing (K1).
    * EVERYTHING is exact integer arithmetic (the halfUp DIV device,
    * exact DECIMAL sums, ppm publishes); map-only per doc + one
    * source-keyed aggregate.
    */
  def qSpanCorruptionPlan(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val per = Tables.documents(spark, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("nt"))
      .filter(col("nt") >= 1)
      .withColumn("spans",
        greatest(lit(1L), expr("(2 * nt + 20) DIV 40")))
      .withColumn("corrupted", least(col("spans") * 3, col("nt")))
      .withColumn("input_len", col("nt") - col("corrupted") + col("spans"))
      .withColumn("target_len", col("corrupted") + col("spans") + 1)
    def ppm(num: String, den: String): org.apache.spark.sql.Column =
      expr(s"CAST((2 * CAST($num AS DECIMAL(38,0)) * 1000000 + $den)" +
        s" DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT)")
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt").cast(d38)).cast("long").as("tok_total"),
        sum(col("spans").cast(d38)).cast("long").as("n_spans"),
        sum(col("corrupted").cast(d38)).cast("long").as("tok_corrupted"),
        sum(col("input_len").cast(d38)).cast("long").as("input_total"),
        sum(col("target_len").cast(d38)).cast("long").as("target_total"))
      .select(col("source"), col("n_docs"), col("tok_total"), col("n_spans"),
        col("tok_corrupted"), col("input_total"), col("target_total"),
        ppm("tok_corrupted", "tok_total").as("corruption_ppm"),
        ppm("input_total + target_total", "tok_total").as("overhead_ppm"))
  }

  val qSpanCorruptionPlanSql: String =
    raw"""WITH per AS (SELECT source, len($duckToks) AS nt
         |  FROM documents),
         |pl AS (SELECT source, nt,
         |    greatest(1, (2 * nt + 20) // 40) AS spans
         |  FROM per WHERE nt >= 1),
         |p2 AS (SELECT source, nt, spans,
         |    least(spans * 3, nt) AS corrupted
         |  FROM pl),
         |p3 AS (SELECT source, nt, spans, corrupted,
         |    nt - corrupted + spans AS input_len,
         |    corrupted + spans + 1 AS target_len
         |  FROM p2),
         |agg AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(CAST(nt AS HUGEINT)) AS BIGINT) AS tok_total,
         |    CAST(sum(CAST(spans AS HUGEINT)) AS BIGINT) AS n_spans,
         |    CAST(sum(CAST(corrupted AS HUGEINT)) AS BIGINT) AS tok_corrupted,
         |    CAST(sum(CAST(input_len AS HUGEINT)) AS BIGINT) AS input_total,
         |    CAST(sum(CAST(target_len AS HUGEINT)) AS BIGINT) AS target_total
         |  FROM p3 GROUP BY 1)
         |SELECT source, n_docs, tok_total, n_spans, tok_corrupted,
         |  input_total, target_total,
         |  CAST((2 * CAST(tok_corrupted AS HUGEINT) * 1000000 + tok_total)
         |    // (2 * CAST(tok_total AS HUGEINT)) AS BIGINT) AS corruption_ppm,
         |  CAST((2 * CAST(input_total + target_total AS HUGEINT) * 1000000
         |      + tok_total)
         |    // (2 * CAST(tok_total AS HUGEINT)) AS BIGINT) AS overhead_ppm
         |FROM agg""".stripMargin

  // ---------------------------------------------------------------- B8
  /** Repetition quality signals per document (the Gopher-style
    * repetition filters, re-expressed for a newline-free corpus):
    * fraction of tokens belonging to duplicated bigrams, most-frequent
    * token share, distinct-token ratio. High duplicate-bigram mass =
    * boilerplate/looped generation; low distinct ratio = degenerate
    * text. All three ride one shuffle on doc_id.
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenStream(spark, dir)
    val tokStats = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_cnt"),
        count(lit(1)).as("n_distinct"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bgStats = toks
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup_bg"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 6).as("top_token_frac"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("distinct_ratio"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("dup_bg").cast("double") / col("n_bigrams"), 6))
          .as("dup_bigram_frac"))
  }

  val qRepetitionSql: String =
    raw"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |tc AS (SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
         |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(max(c) AS BIGINT) AS top_cnt, count(*) AS n_distinct
         |  FROM tc GROUP BY 1),
         |bc AS (SELECT doc_id, bg, count(*) AS c
         |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t) GROUP BY 1, 2),
         |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup_bg
         |  FROM bc GROUP BY 1)
         |SELECT ts.doc_id, n_tokens,
         |  round(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_token_frac,
         |  round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
         |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
         |       ELSE round(CAST(dup_bg AS DOUBLE) / n_bigrams, 6) END AS dup_bigram_frac
         |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin

  // ---------------------------------------------------------------- B9
  /** Per-document mean unigram surprisal (−ln p under the corpus
    * unigram LM) — the cheapest model-based quality signal: documents
    * of improbable tokens score high, boilerplate scores low. The
    * distinct-token set of a web-scale corpus is itself corpus-scale
    * (URLs, ids, typos keep the tail growing), so the vocabulary is
    * NOT broadcast: tokens and vocabulary shuffle-join on `tok`, which
    * both sides are already clustered on after the vocab aggregation.
    * Only the one-row corpus total broadcasts.
    */
  def qUnigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenStream(spark, dir)
      .select(col("doc_id"), col("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("long").as("total"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("total"))), 6)
          .as("mean_surprisal"))
  }

  val qUnigramSurprisalSql: String =
    raw"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
         |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 6) AS mean_surprisal
         |FROM toks JOIN vocab USING (tok), tot
         |GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- B11
  /** Per-document mean BIGRAM surprisal under the corpus bigram LM
    * with add-one smoothing — one modeling step up from
    * [[qUnigramSurprisal]]: repetitive word-salad that fools a unigram
    * model (every token common, all transitions improbable) scores
    * high here, fluent boilerplate scores low. The usual KenLM-style
    * perplexity gate, reduced to what a portable oracle can replay.
    *
    * p(w2|w1) = (c(w1,w2) + 1) / (h(w1) + V), where h(w1) is the
    * bigram-history count (Σ_w c(w1,w)) and V the unigram vocabulary.
    *
    * 100 TB shape: the bigram stream is produced by a doc-bounded
    * `lead` window (the A27 linear-pair device, one shuffle on
    * doc_id); bigram counts and history counts are corpus-scale, so
    * both join back by SHUFFLE on their keys (never broadcast — same
    * contract as B9); only the one-row V broadcasts.
    */
  def qBigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenStream(spark, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("nxt").as("w2"))
    val bgc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val hist = bgc.groupBy(col("w1")).agg(sum(col("c12")).as("h1"))
    val vsz = toks.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    bg.join(bgc, Seq("w1", "w2"))
      .join(hist, Seq("w1"))
      .crossJoin(broadcast(vsz))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("c12") + lit(1)).cast("double") /
          (col("h1") + col("v")).cast("double"))), 6).as("mean_bigram_surprisal"))
  }

  val qBigramSurprisalSql: String =
    raw"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |bgs AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM t),
         |bgc AS (SELECT w1, w2, count(*) AS c12 FROM bgs GROUP BY 1, 2),
         |hist AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS h1 FROM bgc GROUP BY 1),
         |vsz AS (SELECT count(DISTINCT tok) AS v
         |  FROM (SELECT unnest(toks) AS tok FROM t))
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln(CAST(c12 + 1 AS DOUBLE) / (h1 + v))), 6) AS mean_bigram_surprisal
         |FROM bgs JOIN bgc USING (w1, w2) JOIN hist USING (w1), vsz
         |GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- B29
  /** Stupid-backoff bigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the production-LM
    * answer to B11's add-one smoothing: at web scale you don't smooth,
    * you BACK OFF — S(w₂|w₁) = c(w₁w₂)/c(w₁) when the bigram was seen
    * in training, else α·(c(w₂)+1)/(N+V) with α = 0.4 (add-1 on the
    * unigram fallback covers OOV). Scored on the HELD-OUT md5 tier
    * (b ≥ 90, the K16 split) against the b < 80 train mass, reported
    * per source: bigram volume, how often the model had to back off
    * (the coverage signal a mixture rebalance reads), and the mean
    * negative log-score (the quality signal). Scale shape: bigram and
    * unigram count tables are corpus-scale and join the held stream
    * by SHUFFLE on their keys (never broadcast — the B9/B11
    * contract); only the one-row (N, V) totals broadcast; the held
    * stream is 10 % of one token pass.
    */
  val BackoffAlpha = 0.4

  def qStupidBackoff(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % 100
    val toks = TextAnalysis.tokenStream(spark, dir).withColumn("b", bucket)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val train = toks.filter(col("b") < 80)
    val uni = train.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).cast("long").as("n"),
      count(lit(1)).as("v"))
    val bgc = train.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("tok").as("w1"), col("nxt").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val held = toks.filter(col("b") >= 90)
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("nxt").as("w2"))
    val scored = held
      .join(bgc, Seq("w1", "w2"), "left")
      .join(uni.select(col("tok").as("w1"), col("c1").as("cw1")),
        Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("c1").as("cw2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("backoff", col("c12").isNull)
      .withColumn("s",
        when(!col("backoff"),
          -log(col("c12").cast("double") / col("cw1").cast("double")))
        .otherwise(-log(lit(BackoffAlpha) *
          (coalesce(col("cw2"), lit(0L)) + 1).cast("double") /
          (col("n") + col("v")).cast("double"))))
    scored
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("backoff"), 1L).otherwise(0L)).as("n_backoff"),
        round(avg(col("s")), 6).as("mean_neg_logscore"))
      .select(col("source"), col("n_bigrams"), col("n_backoff"),
        round(col("n_backoff").cast("double") / col("n_bigrams"), 6)
          .as("backoff_rate"),
        col("mean_neg_logscore"))
  }

  val qStupidBackoffSql: String =
    raw"""WITH t AS (SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b,
         |    $duckToks AS toks FROM documents),
         |tr AS (SELECT doc_id, toks FROM t WHERE b < 80),
         |uni AS (SELECT tok, count(*) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM tr) GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n, count(*) AS v FROM uni),
         |bgc AS (SELECT w1, w2, count(*) AS c12 FROM (SELECT
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM tr) GROUP BY 1, 2),
         |hd AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM t WHERE b >= 90),
         |sc AS (SELECT h.doc_id,
         |    CASE WHEN c.c12 IS NULL THEN 1 ELSE 0 END AS backoff,
         |    CASE WHEN c.c12 IS NOT NULL
         |      THEN -ln(CAST(c.c12 AS DOUBLE) / u1.c1)
         |      ELSE -ln($BackoffAlpha * CAST(coalesce(u2.c1, 0) + 1 AS DOUBLE)
         |        / (tot.n + tot.v)) END AS s
         |  FROM hd h LEFT JOIN bgc c USING (w1, w2)
         |    LEFT JOIN uni u1 ON h.w1 = u1.tok
         |    LEFT JOIN uni u2 ON h.w2 = u2.tok, tot)
         |SELECT d.source, count(*) AS n_bigrams,
         |  CAST(sum(backoff) AS BIGINT) AS n_backoff,
         |  round(CAST(sum(backoff) AS DOUBLE) / count(*), 6) AS backoff_rate,
         |  round(avg(s), 6) AS mean_neg_logscore
         |FROM sc JOIN documents d USING (doc_id)
         |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- B12
  /** Top-20 adjacent-token collocations by pointwise mutual
    * information — the corpus-linguistics lens on tokenizer/vocab
    * design: high-PMI pairs are the multi-word units worth merging,
    * and a drift in the top collocations flags a source change.
    * Convention (mirrored exactly in the oracle): p(w1,w2) = c12/N
    * over bigram positions, p(w) = c(w)/T over token positions; all
    * ratios taken in double BEFORE multiplication so no integer
    * product can overflow at corpus scale. Minimum support c12 ≥ 5
    * kills the noise tail. Top-k is orderBy+limit — Spark's
    * distributed TakeOrdered, no global window, no full sort
    * materialized. Ranking on the 6-dp-rounded PMI with (w1, w2)
    * tiebreak keeps the cut deterministic across engines.
    */
  val PmiMinSupport = 5

  // ---------------------------------------------------------------- B30
  /** PPMI co-occurrence embeddings + cosine-neighbor readout — the
    * train-the-embeddings step (Levy & Goldberg 2014: word2vec's SGNS
    * factorizes exactly this shifted-PMI matrix): B12 reads the top
    * collocations OFF the co-occurrence counts; this TRAINS sparse
    * vectors from them and answers the question an embedding consumer
    * asks first ("what is near X?") — closing the gap where the
    * engine previously assumed the embeddings table was given.
    *
    * Pipeline (every stage vocab-keyed, the B9 contract — no corpus²):
    * symmetric ±2-token window over the shared cached token stream →
    * directed pair counts c(a,b) (two leads + a mirrored union, so
    * c is symmetric) → PPMI per (token, context): the positivity
    * gate and the DIM RANKING are pure integer arithmetic
    * (ppmi > 0 ⟺ c_ab·T > c_a·c_b exactly; per-token dim order is
    * (c_ab·10¹² DIV c_b) DESC — T, c_a constant within a token, and
    * ln is monotone, so this IS the PPMI order with no float in the
    * cut), while the WEIGHT w = round(ln(arg)·10⁶) µ-quantizes one
    * ln of ONE double division of exact integers (the E33 device) →
    * top-8 dims per token form the sparse vector → cosine neighbors
    * for the 8 most frequent tokens (count DESC, token ASC — exact
    * panel): dot products via a dim-keyed join of the probes' dims
    * against all vectors, exact DECIMAL(38,0) sums, neighbor rank by
    * the exact integer key (num² DIV ‖t‖²) DESC (monotone with
    * cosine for num ≥ 0, which PPMI guarantees; unit-granularity
    * quantization, ties → token ASC); published cosine =
    * num/(√np·√nt), fixed-order doubles over exact integers (IEEE
    * sqrt correctly rounded). Bounds: w ≤ ln(4·10¹³)·10⁶ ≈ 3.2·10⁷
    * at 100 TB → num ≤ 8·10¹⁵, num² ≤ 6.4·10³¹ < 10³⁸, and the
    * rank key num² DIV nt ≤ 64·w² ≈ 6.5·10¹⁶ — inside the LONG
    * range Spark's DIV publishes (a ×10⁶ lift here overflowed to
    * NULL and silently sank the best neighbors; caught in r15 dev).
    * Min count 5 (the B12 floor) kills the noise tail.
    */
  val PpmiMinCount = 5
  val PpmiTopDims = 8
  val PpmiProbes = 8
  val PpmiNeighbors = 5

  def qPpmiEmbed(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val toks = TextAnalysis.tokenStream(spark, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val nbr = toks
      .withColumn("x1", lead(col("tok"), 1).over(w))
      .withColumn("x2", lead(col("tok"), 2).over(w))
    val fwd = nbr.select(col("tok").as("w1"), col("x1").as("w2"))
      .unionAll(nbr.select(col("tok").as("w1"), col("x2").as("w2")))
      .filter(col("w2").isNotNull)
    val sym = fwd.unionAll(fwd.select(col("w2").as("w1"), col("w1").as("w2")))
    // cached: the total-mass aggregate and the PPMI join both consume
    // co — uncached each replays the 4×-exploded pair stream
    val co = sym.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      .cache()
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val keep = uni.filter(col("c") >= PpmiMinCount)
    val tt = co.agg(sum(col("cab")).cast("long").as("t"))
    val pos = co
      .join(keep.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(keep.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tt))
      // positivity gate on exact integers: ppmi > 0 ⟺ cab·T > c1·c2
      .filter(col("cab").cast(d38) * col("t") >
        col("c1").cast(d38) * col("c2"))
    val rkw = Window.partitionBy(col("w1"))
      .orderBy(expr(s"(CAST(cab AS $d38) * 1000000000000) DIV c2").desc,
        col("w2").asc)
    val dims = pos.withColumn("rk", row_number().over(rkw))
      .filter(col("rk") <= PpmiTopDims)
      .select(col("w1").as("tok"), col("w2").as("dim"),
        round(log((col("cab").cast(d38) * col("t")).cast("double") /
          (col("c1").cast(d38) * col("c2")).cast("double")) * 1e6)
          .cast("long").as("wq"))
      .cache()
    dims.count()
    val nrm = dims.groupBy(col("tok"))
      .agg(sum((col("wq").cast(d38) * col("wq")).cast(d38)).as("n2"))
    val probes = keep.orderBy(col("c").desc, col("tok").asc)
      .limit(PpmiProbes).select(col("tok").as("probe"))
    val pd = dims.join(broadcast(probes), col("tok") === col("probe"))
      .select(col("probe"), col("dim"), col("wq").as("wp"))
    val cand = pd.join(dims.select(col("tok").as("neighbor"), col("dim"),
        col("wq").as("wt")), "dim")
      .filter(col("neighbor") =!= col("probe"))
      .groupBy(col("probe"), col("neighbor"))
      .agg(sum((col("wp").cast(d38) * col("wt")).cast(d38)).as("num"),
        count(lit(1)).as("n_shared_dims"))
    val scored = cand
      .join(nrm.select(col("tok").as("probe"), col("n2").as("np")), "probe")
      .join(nrm.select(col("tok").as("neighbor"), col("n2").as("nt")),
        "neighbor")
    // Spark's DIV publishes LONG (and silently NULLs on overflow —
    // caught in r15 dev: a ×10⁶ lift here overflowed exactly the
    // highest-cosine rows and sank them); unscaled num²/nt is
    // long-safe by Cauchy–Schwarz: num ≤ 8·wp_max·wt_max and
    // nt ≥ wt_max², so num² DIV nt ≤ 64·wp_max² ≈ 6.5·10¹⁶ at 100 TB
    val nw = Window.partitionBy(col("probe"))
      .orderBy(expr(s"(CAST(num AS $d38) * num) DIV nt").desc,
        col("neighbor").asc)
    val out = scored.withColumn("neighbor_rank", row_number().over(nw))
      .filter(col("neighbor_rank") <= PpmiNeighbors)
      .select(col("probe"), col("neighbor_rank"), col("neighbor"),
        col("n_shared_dims"),
        round(col("num").cast("double") /
          (sqrt(col("np").cast("double")) * sqrt(col("nt").cast("double"))),
          6).as("cos_sim"))
      .cache()
    out.count()
    dims.unpersist(); co.unpersist()
    out
  }

  val qPpmiEmbedSql: String =
    raw"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |p1 AS (SELECT
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM t),
         |p2 AS (SELECT
         |    unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i + 2])) AS w2
         |  FROM t),
         |fwd AS (SELECT w1, w2 FROM p1 UNION ALL SELECT w1, w2 FROM p2),
         |sym AS (SELECT w1, w2 FROM fwd UNION ALL SELECT w2, w1 FROM fwd),
         |co AS (SELECT w1, w2, count(*) AS cab FROM sym GROUP BY 1, 2),
         |uni AS (SELECT tok, count(*) AS c
         |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
         |keep AS (SELECT tok, c FROM uni WHERE c >= $PpmiMinCount),
         |tt AS (SELECT CAST(sum(cab) AS BIGINT) AS t FROM co),
         |pos AS (SELECT co.w1, co.w2, cab, k1.c AS c1, k2.c AS c2, t
         |  FROM co JOIN keep k1 ON co.w1 = k1.tok
         |    JOIN keep k2 ON co.w2 = k2.tok, tt
         |  WHERE CAST(cab AS HUGEINT) * t > CAST(k1.c AS HUGEINT) * k2.c),
         |rkd AS (SELECT *, row_number() OVER (PARTITION BY w1 ORDER BY
         |      (CAST(cab AS HUGEINT) * 1000000000000) // c2 DESC, w2 ASC)
         |    AS rk
         |  FROM pos),
         |dims AS (SELECT w1 AS tok, w2 AS dim,
         |    CAST(round(ln(CAST(CAST(cab AS HUGEINT) * t AS DOUBLE)
         |      / CAST(CAST(c1 AS HUGEINT) * c2 AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS wq
         |  FROM rkd WHERE rk <= $PpmiTopDims),
         |nrm AS (SELECT tok, sum(CAST(wq AS HUGEINT) * wq) AS n2
         |  FROM dims GROUP BY 1),
         |probes AS (SELECT tok AS probe FROM keep
         |  ORDER BY c DESC, tok ASC LIMIT $PpmiProbes),
         |cand AS (SELECT p.probe, d2.tok AS neighbor,
         |    sum(CAST(d1.wq AS HUGEINT) * d2.wq) AS num,
         |    count(*) AS n_shared_dims
         |  FROM probes p JOIN dims d1 ON d1.tok = p.probe
         |    JOIN dims d2 ON d2.dim = d1.dim AND d2.tok <> p.probe
         |  GROUP BY 1, 2),
         |scored AS (SELECT c.probe, c.neighbor, c.num, c.n_shared_dims,
         |    np.n2 AS np, nt.n2 AS nt,
         |    row_number() OVER (PARTITION BY c.probe ORDER BY
         |      (c.num * c.num) // nt.n2 DESC, c.neighbor ASC)
         |      AS neighbor_rank
         |  FROM cand c JOIN nrm np ON np.tok = c.probe
         |    JOIN nrm nt ON nt.tok = c.neighbor)
         |SELECT probe, CAST(neighbor_rank AS BIGINT) AS neighbor_rank,
         |  neighbor, n_shared_dims,
         |  round(CAST(num AS DOUBLE)
         |    / (sqrt(CAST(np AS DOUBLE)) * sqrt(CAST(nt AS DOUBLE))), 6)
         |    AS cos_sim
         |FROM scored WHERE neighbor_rank <= $PpmiNeighbors""".stripMargin

  def qPmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenStream(spark, dir)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).cast("long").as("t"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("tok").as("w1"), col("nxt").as("w2"))
    val bgc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val nbg = bgc.agg(sum(col("c12")).cast("long").as("n"))
    val pmi = log(
      (col("c12").cast("double") / col("n")) /
        ((col("c1").cast("double") / col("t")) * (col("c2").cast("double") / col("t"))))
    bgc.filter(col("c12") >= PmiMinSupport)
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nbg)).crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"), round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
  }

  val qPmiCollocationsSql: String =
    raw"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |toks AS (SELECT unnest(toks) AS tok FROM t),
         |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM uni),
         |bgs AS (SELECT
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM t),
         |bgc AS (SELECT w1, w2, count(*) AS c12 FROM bgs GROUP BY 1, 2),
         |nbg AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM bgc)
         |SELECT w1, w2, c12,
         |  round(ln((CAST(c12 AS DOUBLE) / n) /
         |    ((CAST(u1.c AS DOUBLE) / tt) * (CAST(u2.c AS DOUBLE) / tt))), 6) AS pmi
         |FROM bgc JOIN uni u1 ON bgc.w1 = u1.tok JOIN uni u2 ON bgc.w2 = u2.tok, nbg, tot
         |WHERE c12 >= $PmiMinSupport
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- K10
  /** Vocabulary coverage curve: the share of total token mass covered
    * by the top-k most frequent tokens, for the tokenizer-design k's —
    * the diagnostic behind "how big must the vocab be" and "how much
    * of the stream is head tokens". SORT-FREE: ranking the vocabulary
    * would be a corpus-scale global sort, so the curve is computed on
    * the count-of-counts histogram (distinct frequency VALUES — ≤
    * O(√mass) rows at any corpus size, the H5/K7 device): classes are
    * scanned in one bounded descending window, and a top-k cutoff
    * landing inside a frequency class contributes partially. Exact,
    * and well-defined under ties (tied tokens are interchangeable).
    */
  val CoverageKs: Seq[Long] = Seq(16L, 64L, 256L, 1024L, 4096L)

  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenStream(spark, dir).select(col("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val cc = vocab.groupBy(col("cnt")).agg(count(lit(1)).as("n"))
    // bounded-by-construction global window (exempted in PlanSpec)
    val wPrev = Window.orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cc.withColumn("toks_before",
      coalesce(sum(col("n")).over(wPrev), lit(0L)))
    // totals from the bounded histogram, not a second vocab aggregate
    val tot = cc.agg(sum(col("cnt") * col("n")).cast("long").as("total_mass"),
      sum(col("n")).as("vocab_size"))
    val ks = spark.createDataFrame(CoverageKs.map(Tuple1(_))).toDF("k")
    cum.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(sum(col("cnt") *
        greatest(lit(0L), least(col("n"), col("k") - col("toks_before"))))
        .as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), least(col("k"), col("vocab_size")).as("top_tokens"),
        round(col("covered").cast("double") / col("total_mass"), 6).as("coverage"))
  }

  val qVocabCoverageSql: String =
    raw"""WITH toks AS (SELECT unnest($duckToks) AS tok FROM documents),
         |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
         |cc AS (SELECT cnt, count(*) AS n FROM vocab GROUP BY 1),
         |cum AS (SELECT cnt, n, coalesce(sum(n) OVER (ORDER BY cnt DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS toks_before FROM cc),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_mass,
         |  count(*) AS vocab_size FROM vocab),
         |ks AS (SELECT CAST(unnest([16, 64, 256, 1024, 4096]) AS BIGINT) AS k)
         |SELECT k, least(k, vocab_size) AS top_tokens,
         |  round(CAST(sum(cnt * greatest(0, least(n, k - toks_before))) AS DOUBLE)
         |    / total_mass, 6) AS coverage
         |FROM cum, ks, tot GROUP BY k, vocab_size, total_mass""".stripMargin

  // ---------------------------------------------------------------- K11
  /** Per-document sliding-window chunk plan (512-token chunks, 128
    * overlap → stride 384): the WITHIN-document layout for long-doc
    * training and retrieval indexing, complementing K1's cross-doc
    * concat-and-chunk packing. Reports the chunk count and the two
    * costs the layout decision trades off — overlap-duplicated tokens
    * and final-chunk padding. Pure map-side arithmetic on the token
    * count: embarrassingly parallel at any corpus size.
    */
  val ChunkTokens = 512
  val ChunkOverlap = 128

  def qChunkPlan(spark: SparkSession, dir: String): DataFrame = {
    val stride = ChunkTokens - ChunkOverlap
    val n = size(tokens(col("text")))
    val nChunks = when(n <= ChunkTokens, lit(1L))
      .otherwise(lit(1L) + floor((n - ChunkTokens + stride - 1) / lit(stride)).cast("long"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), n.cast("long").as("n_tokens"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        ((col("n_chunks") - 1) * ChunkOverlap).as("dup_tokens"),
        (lit(ChunkTokens.toLong) + (col("n_chunks") - 1) * stride - col("n_tokens"))
          .as("pad_tokens"))
  }

  val qChunkPlanSql: String = {
    val stride = ChunkTokens - ChunkOverlap
    raw"""WITH t AS (SELECT doc_id, len($duckToks) AS n FROM documents),
         |c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN n <= $ChunkTokens THEN 1
         |       ELSE 1 + (n - $ChunkTokens + $stride - 1) // $stride END AS BIGINT) AS n_chunks
         |  FROM t)
         |SELECT doc_id, n_tokens, n_chunks,
         |  (n_chunks - 1) * $ChunkOverlap AS dup_tokens,
         |  $ChunkTokens + (n_chunks - 1) * $stride - n_tokens AS pad_tokens
         |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- K1
  /** Context-window sequence packing (concat-and-chunk, the GPT-style
    * pretraining layout): documents are concatenated in doc_id order
    * WITHIN EACH SOURCE SHARD and sliced into fixed 512-token chunks;
    * each document reports its token offset and the chunk span it
    * lands in. Packing is shard-local by contract — the running-sum
    * window partitions by source, so no global ordering (and no
    * single-partition window) exists at any corpus size.
    */
  val CtxTokens = 512

  def qSeqPacking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset DIV $CtxTokens").as("first_chunk"),
        expr(s"(tok_offset + n_tokens - 1) DIV $CtxTokens").as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  // ---------------------------------------------------------------- K20
  /** PER-SOURCE packing readout at the DEPLOYED context size — the
    * shard axis K16's q_packing_efficiency (a context-size sweep,
    * corpus-wide) doesn't give: which source shards fragment the
    * budget (low fill, many boundary-crossing docs) once the ctx is
    * committed. Chunk count is exact ceil in integer arithmetic;
    * rides the SAME per-source window as K1, then folds to one row
    * per source — nothing beyond K1's single shuffle.
    */
  def qPackEfficiency(spark: SparkSession, dir: String): DataFrame =
    qSeqPacking(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("first_chunk") =!= col("last_chunk"), 1L)
          .otherwise(0L)).as("n_spanning"))
      .withColumn("n_chunks",
        expr(s"(total_tokens + ${CtxTokens - 1}) DIV $CtxTokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_chunks"), col("n_spanning"),
        round(col("total_tokens").cast("double") /
          (col("n_chunks") * CtxTokens), 6).as("fill_rate"),
        round(col("n_docs").cast("double") / col("n_chunks"), 6)
          .as("docs_per_chunk"))

  val qPackEfficiencySql: String =
    raw"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tok_offset
         |  FROM d),
         |agg AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(sum(CASE WHEN tok_offset // $CtxTokens
         |          <> (tok_offset + n_tokens - 1) // $CtxTokens
         |        THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
         |  FROM o GROUP BY 1)
         |SELECT source, n_docs, total_tokens,
         |  (total_tokens + ${CtxTokens - 1}) // $CtxTokens AS n_chunks,
         |  n_spanning,
         |  round(total_tokens * 1.0
         |    / (((total_tokens + ${CtxTokens - 1}) // $CtxTokens) * $CtxTokens), 6)
         |    AS fill_rate,
         |  round(n_docs * 1.0
         |    / ((total_tokens + ${CtxTokens - 1}) // $CtxTokens), 6)
         |    AS docs_per_chunk
         |FROM agg""".stripMargin

  val qSeqPackingSql: String =
    raw"""WITH d AS (SELECT doc_id, source,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT doc_id, source, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
         |  FROM d)
         |SELECT doc_id, source, n_tokens, tok_offset,
         |  tok_offset // $CtxTokens AS first_chunk,
         |  (tok_offset + n_tokens - 1) // $CtxTokens AS last_chunk,
         |  ((tok_offset + n_tokens - 1) // $CtxTokens) - (tok_offset // $CtxTokens) + 1 AS n_chunks
         |FROM o""".stripMargin

  // ---------------------------------------------------------------- K2
  /** Deterministic train/val/test assignment: bucket = first 15 hex
    * chars of md5(doc_id) mod 100 (engine-portable, stable across
    * runs and machines — the property a split assignment must have so
    * re-runs never leak eval docs into train). 80/10/10; reported as
    * per-split × language doc/token counts (the split audit table).
    * Pure map-side arithmetic + one low-cardinality aggregate.
    */
  def qHashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % 100
    Tables.documents(spark, dir)
      .select(
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"),
        col("lang"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  val qHashSplitSql: String =
    raw"""WITH d AS (SELECT
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
         |  lang, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM d GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- K5
  /** Per-source document cap — the "max pages per domain" primitive
    * that stops a single hot source from dominating the training mix.
    * Docs rank within their source by md5(doc_id) (a stable
    * pseudo-random order, so the kept subset is uniform AND
    * deterministic across runs/engines); the first [[SourceCap]]
    * survive. One shuffle on source; `WindowGroupLimit` pushes the
    * rank cutoff below the sort at any source size.
    */
  val SourceCap = 20

  def qSourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= SourceCap)
  }

  val qSourceCapSql: String =
    s"""WITH r AS (SELECT doc_id, source,
       |  row_number() OVER (PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS samp_rank
       |  FROM documents)
       |SELECT doc_id, source, CAST(samp_rank AS BIGINT) AS samp_rank
       |FROM r WHERE samp_rank <= $SourceCap""".stripMargin

  // ---------------------------------------------------------------- F11
  /** Trailing z-score anomaly detection over hour-bucketed event
    * counts — the ingest-monitoring primitive (did a source spike or
    * stall?). Baseline = the trailing 48 OBSERVED buckets per type
    * (rows-frame, so gap hours don't dilute it); buckets with fewer
    * than 24 baseline points or zero variance are withheld (no stable
    * baseline → no verdict). One shuffle on event_type; the window
    * scan is within-partition. Bucket width is a deployment knob —
    * sized so per-bucket counts carry variance at the observed rate.
    */
  val AnomalyMinBase = 24

  def qAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(col("event_type"),
        (expr("(ts DIV 1000000000) DIV 3600") * 3600).cast("long").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-48, -1)
    val z = (col("n") - col("mu")) / col("sd")
    counts
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .withColumn("n_base", count(col("n")).over(w))
      .where(col("n_base") >= AnomalyMinBase && col("sd") > 1e-9)
      .select(col("event_type"), col("hour"), col("n"),
        round(col("mu"), 4).as("baseline_mean"),
        round(z, 4).as("z"),
        (abs(z) > 3.0).as("is_anomaly"))
  }

  val qAnomalySql: String =
    s"""WITH c AS (SELECT event_type, ($duckTsSec // 3600) * 3600 AS hour, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |s AS (SELECT event_type, hour, n,
       |  avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd, count(n) OVER w AS n_base
       |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hour
       |    ROWS BETWEEN 48 PRECEDING AND 1 PRECEDING))
       |SELECT event_type, hour, n, round(mu, 4) AS baseline_mean,
       |  round((n - mu) / sd, 4) AS z, (abs((n - mu) / sd) > 3.0) AS is_anomaly
       |FROM s WHERE n_base >= $AnomalyMinBase AND sd > 1e-9""".stripMargin

  // ---------------------------------------------------------------- K3
  /** Language-mixture reweighting: per-language token mass vs a
    * uniform target mixture → the per-language sampling weight a
    * training pipeline applies (weight > 1 = upsample). One
    * low-cardinality aggregate; the one-row total broadcasts. The
    * target is a parameter of the operator contract — uniform here,
    * any target vector in deployment.
    */
  def qMixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"), tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val totals = perLang.agg(
      sum(col("n_tokens")).cast("long").as("total_tokens"),
      count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens"), 6).as("share"),
        round((lit(1.0) / col("n_langs")) /
          (col("n_tokens").cast("double") / col("total_tokens")), 6).as("weight"))
  }

  val qMixtureWeightsSql: String =
    raw"""WITH p AS (SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  count(*) AS n_langs FROM p)
         |SELECT lang, n_docs, n_tokens,
         |  round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS share,
         |  round((1.0 / n_langs) / (CAST(n_tokens AS DOUBLE) / total_tokens), 6) AS weight
         |FROM p, t""".stripMargin

  // ---------------------------------------------------------------- K26
  /** Temperature-scaled sampling weights per language — the standard
    * multilingual compromise BETWEEN K3's two poles: proportional
    * sampling (α=1) drowns low-resource languages, uniform (α=0,
    * K3's target) over-repeats them; w_l ∝ p_l^α with
    * α=[[TempAlpha]] is the published middle path. Emits each
    * language's raw token share, its temperature weight, and the
    * implied upsampling factor w_l/p_l (>1 = the language is drawn
    * more often than its corpus share — the number that predicts its
    * effective epoch count under the mixture). Float discipline: the
    * share is 10-dp-rounded BEFORE pow so both engines exponentiate
    * identical IEEE inputs, pow's ≤1-ulp libm spread is absorbed by a
    * second 10-dp round, and the |langs|-row normalizer sums those
    * rounded values; one keyed aggregate + a broadcast totals row,
    * |langs| output rows.
    */
  val TempAlpha: Double = 0.7

  def qTemperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"), tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = perLang.agg(sum(col("n_tokens")).cast("long").as("t"))
    val shared = perLang.crossJoin(broadcast(tot))
      .withColumn("p10",
        round(col("n_tokens").cast("double") / col("t"), 10))
      .withColumn("pa", round(pow(col("p10"), TempAlpha), 10))
    val norm = shared.agg(sum(col("pa")).as("spa"))
    shared.crossJoin(broadcast(norm))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("p10"), 6).as("share"),
        round(col("pa") / col("spa"), 6).as("weight"),
        round(col("pa") / col("spa") / col("p10"), 6).as("upsample"))
  }

  val qTemperatureMixtureSql: String =
    raw"""WITH p AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len($duckToks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM p),
         |sh AS (SELECT lang, n_docs, n_tokens,
         |    round(CAST(n_tokens AS DOUBLE) / t, 10) AS p10,
         |    round(pow(round(CAST(n_tokens AS DOUBLE) / t, 10), $TempAlpha),
         |      10) AS pa
         |  FROM p, t),
         |norm AS (SELECT sum(pa) AS spa FROM sh)
         |SELECT lang, n_docs, n_tokens, round(p10, 6) AS share,
         |  round(pa / spa, 6) AS weight,
         |  round(pa / spa / p10, 6) AS upsample
         |FROM sh, norm""".stripMargin

  // ---------------------------------------------------------------- K15
  /** Multi-epoch sampling schedule per SOURCE (the K3 device on the
    * other corpus axis, extended to repeats): under a token budget of
    * [[EpochBudgetMult]]× the corpus with a uniform-source target,
    * each source's epoch count is target/available — >1 means the
    * source repeats across the run (the repeated-data regime whose
    * diminishing returns motivate [[EpochCap]], after which budget is
    * left unspent rather than over-repeated). One bounded aggregate +
    * a broadcast totals row; epochs are 6-dp-rounded before the cap
    * compare so every derived column is engine-exact.
    */
  val EpochBudgetMult = 2.0
  val EpochCap = 4.0

  def qEpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.documents(spark, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("n_tokens"))
    val totals = perSrc.agg(
      sum(col("n_tokens")).cast("long").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(lit(EpochBudgetMult) * col("total_tokens") /
          col("n_sources") / col("n_tokens"), 6).as("epochs"))
      .withColumn("capped_epochs", least(col("epochs"), lit(EpochCap)))
      .withColumn("effective_tokens",
        floor(col("capped_epochs") * col("n_tokens")).cast("long"))
      .withColumn("repeats", col("epochs") > 1.0)
  }

  val qEpochScheduleSql: String =
    raw"""WITH p AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  count(*) AS n_sources FROM p),
         |e AS (SELECT source, n_docs, n_tokens,
         |  round($EpochBudgetMult * total_tokens / n_sources / n_tokens, 6) AS epochs
         |  FROM p, t)
         |SELECT source, n_docs, n_tokens, epochs,
         |  least(epochs, $EpochCap) AS capped_epochs,
         |  CAST(floor(least(epochs, $EpochCap) * n_tokens) AS BIGINT) AS effective_tokens,
         |  (epochs > 1.0) AS repeats
         |FROM e""".stripMargin

  // ---------------------------------------------------------------- K6
  /** Materialize the K3 mixture: emit each document `n_copies` times
    * so per-language token mass approaches the uniform target.
    * n_copies = ⌊w⌋ plus one fractional copy when a DETERMINISTIC
    * per-doc uniform draw (md5(doc_id) first 15 hex / 2⁶⁰ — exact in
    * double, identical in both engines) falls below frac(w) — so the
    * resample is reproducible row-for-row across runs and engines, no
    * RNG state anywhere. Map-side: broadcast per-language weights,
    * explode by copy count; docs with n_copies = 0 are downsampled
    * away. The expansion factor is bounded by the weight vector, not
    * the corpus.
    */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    val weights = qMixtureWeights(spark, dir).select(col("lang"), col("weight"))
    val u = expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
      .cast("double") / math.pow(2, 60)
    val nCopies = (floor(col("weight")) +
      when(u < col("weight") - floor(col("weight")), 1).otherwise(0)).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(broadcast(weights), "lang")
      .withColumn("n_copies", nCopies)
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
  }

  val qResampleSql: String =
    s"""WITH w AS ($qMixtureWeightsSql),
       |d AS (SELECT doc_id, d.lang, w.weight,
       |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / power(2, 60) AS u
       |  FROM documents d JOIN w ON d.lang = w.lang),
       |c AS (SELECT doc_id, lang,
       |  CAST(floor(weight) + (CASE WHEN u < weight - floor(weight) THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
       |  FROM d)
       |SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
       |FROM c WHERE n_copies >= 1""".stripMargin

  // ---------------------------------------------------------------- K4
  /** One-row corpus health dashboard — the numbers a data curator
    * checks before a training run: doc count, exact-dup rate, quality
    * floor clearance, end-to-end keep rate (composes the B7 keep-list
    * semantics and the B3 quality score). All aggregation over
    * (hash, id, score) projections; the payload never reshuffles.
    */
  def qCorpusHealth(spark: SparkSession, dir: String): DataFrame = {
    val keep = TextAnalysis.qKeepList(spark, dir)
    val quality = TextAnalysis.qQualityScore(spark, dir)
      .agg(round(avg(col("quality")), 6).as("avg_quality"))
    keep.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("reason") === "exact_dup", 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("reason") === "low_quality", 1L).otherwise(0L)).as("n_low_quality"))
      .crossJoin(broadcast(quality))
      .select(col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 6).as("keep_rate"),
        col("n_exact_dup"), col("n_low_quality"), col("avg_quality"))
  }

  val qCorpusHealthSql: String = {
    val keepSql = TextAnalysis.qKeepListSql
    val qualSql = TextAnalysis.qQualityScoreSql
    s"""WITH keep AS ($keepSql),
       |qual AS (SELECT round(avg(quality), 6) AS avg_quality FROM ($qualSql)),
       |agg AS (SELECT count(*) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN reason = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       |  CAST(sum(CASE WHEN reason = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
       |  FROM keep)
       |SELECT n_docs, n_kept,
       |  round(CAST(n_kept AS DOUBLE) / n_docs, 6) AS keep_rate,
       |  n_exact_dup, n_low_quality, avg_quality
       |FROM agg, qual""".stripMargin
  }

  // ---------------------------------------------------------------- K31
  /** Dataset card (the "datasheets for datasets" summary, Gebru et
    * al. 2018) — the per-source manifest row a corpus release ships:
    * document count, token mass, mean document length, mean B3
    * quality, and language diversity, plus ONE `__total__` row so the
    * headline numbers and the per-source breakdown can never drift
    * apart (both aggregate the SAME pass: the total row is a
    * union-with-relabeled-source, not a second computation).
    * ENGINE-EXACT publishes: quality quantizes to per-doc µ-units
    * BEFORE the mean (integer sum + half-up division — never an
    * unordered double sum), mean length is half-up tokens-per-1000-
    * docs, and language diversity is the Gini–Simpson index 1 − Σp²
    * (the ENTROPY-free diversity — no libm ln) as the exact rational
    * (n² − Σn_l²)/n² in half-up ppm. One corpus scan doubled by the
    * relabel union; all aggregates keyed on source (bounded).
    */
  def qDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = TextAnalysis.scoreQuality(docs)
      .select(col("doc_id"), round(col("quality") * 1000000).cast("long")
        .as("q6"))
    val base0 = docs
      .select(col("doc_id"), col("source"), col("lang"),
        tokenCount(col("text")).cast("long").as("nt"))
      .join(scored, "doc_id")
    val base = base0.union(base0.withColumn("source", lit("__total__"))
      .select(col("doc_id"), col("source"), col("lang"), col("nt"),
        col("q6")))
    val perLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nl"))
      .groupBy(col("source"))
      .agg(sum(col("nl") * col("nl")).as("sl2"),
        count(lit(1)).as("n_langs"))
    val agg = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("nt")).as("total_tokens"),
      sum(col("q6").cast("decimal(38,0)")).as("sq6"))
    def hu(aE: String, bE: String): String =
      s"(2 * ($aE) + ($bE)) DIV (2 * ($bE))"
    agg.join(perLang, "source")
      .withColumn("mean_tokens_permille",
        expr(hu("total_tokens * 1000", "n_docs")))
      .withColumn("mean_quality_ppm",
        expr(hu("cast(sq6 as decimal(38,0))", "cast(n_docs as decimal(38,0))"))
          .cast("long"))
      .withColumn("lang_diversity_ppm", expr(hu(
        "1000000 * (cast(n_docs as decimal(38,0)) * n_docs - sl2)",
        "cast(n_docs as decimal(38,0)) * n_docs")).cast("long"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("mean_tokens_permille"), col("mean_quality_ppm"),
        col("n_langs"), col("lang_diversity_ppm"))
  }

  val qDatasetCardSql: String = {
    def hu(aE: String, bE: String): String =
      s"(2 * ($aE) + ($bE)) // (2 * ($bE))"
    s"""WITH ${TextAnalysis.qualityCtes},
      |scored AS (SELECT doc_id,
      |    CAST(round(quality * 1000000) AS BIGINT) AS q6 FROM qual),
      |base0 AS (SELECT d.doc_id, d.source, d.lang,
      |    CAST(len($duckToks) AS BIGINT) AS nt, s.q6
      |  FROM documents d JOIN scored s ON d.doc_id = s.doc_id),
      |base AS (SELECT * FROM base0
      |  UNION ALL
      |  SELECT doc_id, '__total__' AS source, lang, nt, q6 FROM base0),
      |per_lang AS (SELECT source,
      |    CAST(sum(CAST(nl AS HUGEINT) * nl) AS HUGEINT) AS sl2,
      |    count(*) AS n_langs
      |  FROM (SELECT source, lang, count(*) AS nl FROM base GROUP BY 1, 2)
      |  GROUP BY 1),
      |agg AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(nt) AS BIGINT) AS total_tokens,
      |    sum(CAST(q6 AS HUGEINT)) AS sq6
      |  FROM base GROUP BY 1)
      |SELECT a.source, a.n_docs, a.total_tokens,
      |  ${hu("a.total_tokens * 1000", "a.n_docs")} AS mean_tokens_permille,
      |  CAST(${hu("a.sq6", "CAST(a.n_docs AS HUGEINT)")} AS BIGINT)
      |    AS mean_quality_ppm,
      |  p.n_langs,
      |  CAST(${hu("1000000 * (CAST(a.n_docs AS HUGEINT) * a.n_docs - p.sl2)",
           "CAST(a.n_docs AS HUGEINT) * a.n_docs")} AS BIGINT)
      |    AS lang_diversity_ppm
      |FROM agg a JOIN per_lang p ON a.source = p.source""".stripMargin
  }

  // ---------------------------------------------------------------- K8
  /** Zipf-slope fit per source — the vocabulary-health diagnostic: a
    * natural-language source's term-frequency head follows
    * freq ∝ rank^s with s ≈ −1; boilerplate, spam, and generated
    * text bend the slope. Fit = OLS of ln(freq) on ln(rank) over the
    * top [[ZipfHead]] terms per source. The rank window partitions by
    * source and `WindowGroupLimit` pushes the head cutoff below the
    * sort, so per-source work is bounded by the head size, not the
    * vocabulary; the regression itself runs over ≤ ZipfHead rows per
    * source via plain covar/var aggregates.
    */
  val ZipfHead = 500

  def qZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("tok").asc)
    val top = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ZipfHead)
      .select(col("source"), log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    top.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms_fit"),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"))
      .select(col("source"), col("n_terms_fit"),
        round(col("cxy") / col("vx"), 3).as("zipf_slope"),
        round(col("my") - col("cxy") / col("vx") * col("mx"), 3).as("intercept"))
  }

  val qZipfFitSql: String =
    raw"""WITH tf AS (SELECT source, tok, count(*) AS cnt
         |  FROM (SELECT source, unnest($duckToks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |top AS (SELECT source,
         |    ln(CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, tok ASC) AS DOUBLE)) AS x,
         |    ln(CAST(cnt AS DOUBLE)) AS y,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, tok ASC) AS rank
         |  FROM tf QUALIFY rank <= $ZipfHead)
         |SELECT source, count(*) AS n_terms_fit,
         |  round(covar_pop(x, y) / var_pop(x), 3) AS zipf_slope,
         |  round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 3) AS intercept
         |FROM top GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- K27
  /** Heaps'-law fit of vocabulary growth across sources — the OTHER
    * corpus-linguistics power law (K8's Zipf is rank-frequency WITHIN
    * a source; Heaps is vocabulary-vs-corpus-size ACROSS scales:
    * V ≈ k·N^β). Each source contributes one (ln N_tokens,
    * ln V_distinct) point; the |sources|-row log-log OLS publishes
    * the growth exponent β — the number that forecasts how much NEW
    * vocabulary the next 10× of ingest will bring (β ≈ 0.5 for
    * natural text; a β near 0 fingerprints a closed synthetic
    * vocabulary, near 1 unbounded token noise like IDs). Same fit
    * device as K8 (covar_pop/var_pop, 3-dp publish — the coarse round
    * absorbs co-moment summation-order ulps); the corpus streams once
    * into one (source, tok) keyed aggregate, the fit runs on the
    * bounded per-source frame; per-source rows carry the exact
    * integer (N, V) evidence with the broadcast fit replicated.
    */
  def qHeapsFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    val pts = tf.groupBy(col("source")).agg(
      sum(col("cnt")).cast("long").as("n_tokens"),
      count(lit(1)).as("v_distinct"))
    val fit = pts
      .select(log(col("n_tokens").cast("double")).as("x"),
        log(col("v_distinct").cast("double")).as("y"))
      .agg(count(lit(1)).as("n_sources"),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"))
      .select(col("n_sources"),
        round(col("cxy") / col("vx"), 3).as("heaps_beta"),
        round(col("my") - col("cxy") / col("vx") * col("mx"), 3)
          .as("ln_k"))
    pts.crossJoin(broadcast(fit))
  }

  val qHeapsFitSql: String =
    raw"""WITH tf AS (SELECT source, tok, count(*) AS cnt
         |  FROM (SELECT source, unnest($duckToks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |pts AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |    count(*) AS v_distinct
         |  FROM tf GROUP BY 1),
         |fit AS (SELECT count(*) AS n_sources,
         |    round(covar_pop(ln(CAST(n_tokens AS DOUBLE)),
         |        ln(CAST(v_distinct AS DOUBLE)))
         |      / var_pop(ln(CAST(n_tokens AS DOUBLE))), 3) AS heaps_beta,
         |    round(avg(ln(CAST(v_distinct AS DOUBLE)))
         |      - covar_pop(ln(CAST(n_tokens AS DOUBLE)),
         |          ln(CAST(v_distinct AS DOUBLE)))
         |        / var_pop(ln(CAST(n_tokens AS DOUBLE)))
         |        * avg(ln(CAST(n_tokens AS DOUBLE))), 3) AS ln_k
         |  FROM pts)
         |SELECT source, n_tokens, v_distinct, n_sources, heaps_beta, ln_k
         |FROM pts, fit""".stripMargin

  // ---------------------------------------------------------------- K9
  /** Quality-distribution drift between corpus splits — the snapshot
    * monitor a pipeline runs before accepting a new ingest: exact
    * Kolmogorov–Smirnov D between the train-side and eval-side
    * per-document quality distributions. Scores are quantized to 4 dp
    * as part of the contract (same device as the AUC operator), so
    * the CDF accumulation runs over a BOUNDED bin stream (≤ 10⁴+1
    * bins at any corpus size) — the single-partition window is over
    * bins, never documents; the row stream feeds one
    * map-side-combined aggregate.
    */
  def qQualityDrift(spark: SparkSession, dir: String): DataFrame = {
    val isEval = col("source")
      .isin(Dedup.EvalSources.map(x => x: Any): _*)
    val scored = TextAnalysis.qQualityScore(spark, dir)
      .select(col("doc_id"), round(col("quality"), 4).as("bin"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), isEval.as("is_eval")),
        "doc_id")
    val bins = scored.groupBy(col("bin"))
      .agg(sum(when(!col("is_eval"), 1L).otherwise(0L)).as("n_train_b"),
        sum(when(col("is_eval"), 1L).otherwise(0L)).as("n_eval_b"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bins.agg(sum(col("n_train_b")).as("n_train"),
      sum(col("n_eval_b")).as("n_eval"))
    bins
      .withColumn("cum_train", sum(col("n_train_b")).over(w))
      .withColumn("cum_eval", sum(col("n_eval_b")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("n_train")).as("n_train"), max(col("n_eval")).as("n_eval"),
        max(abs(col("cum_train").cast("double") / col("n_train") -
          col("cum_eval").cast("double") / col("n_eval"))).as("d"))
      .select(col("n_train"), col("n_eval"), round(col("d"), 6).as("ks_d"))
  }

  // ---------------------------------------------------------------- K12
  /** Language × source independence (chi-squared, exact contingency
    * arithmetic): the mixture sanity check — if language composition
    * varies wildly by source, per-language mixture weights (K3) must
    * be applied per source, and a drifting source shows up here before
    * it bends corpus-level stats. One pass builds the contingency
    * counts; the grid (langs × sources) is bounded, so everything
    * after the first aggregate is trivial at any corpus size. Absent
    * cells contribute their expectation, as in the E15 screener.
    */
  def qLangSourceIndependence(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("source"))
    // the ONLY corpus pass — marginals and totals are aggregates over
    // this bounded (langs × sources)-row grid
    val obs = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val nl = obs.groupBy(col("lang")).agg(sum(col("o")).as("nl"))
    val ns = obs.groupBy(col("source")).agg(sum(col("o")).as("ns"))
    val n = obs.agg(sum(col("o")).as("n"))
    val grid = nl.crossJoin(ns).crossJoin(broadcast(n))
      .select(col("lang"), col("source"),
        (col("nl").cast("double") * col("ns") / col("n")).as("ex"))
    grid.join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(
        nl.agg(count(lit(1)).as("n_langs")).crossJoin(ns.agg(count(lit(1)).as("n_sources")))))
      .groupBy(col("n_langs"), col("n_sources"))
      .agg(round(sum(pow(coalesce(col("o"), lit(0L)) - col("ex"), 2) / col("ex")), 4)
        .as("chi2"))
      .select(col("n_langs"), col("n_sources"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"), col("chi2"))
  }

  val qLangSourceIndependenceSql: String =
    raw"""WITH d AS (SELECT lang, source FROM documents),
         |obs AS (SELECT lang, source, count(*) AS o FROM d GROUP BY 1, 2),
         |nl AS (SELECT lang, count(*) AS nl FROM d GROUP BY 1),
         |ns AS (SELECT source, count(*) AS ns FROM d GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM d),
         |dims AS (SELECT (SELECT count(*) FROM nl) AS n_langs,
         |  (SELECT count(*) FROM ns) AS n_sources),
         |grid AS (SELECT nl.lang, ns.source,
         |    CAST(nl.nl AS DOUBLE) * ns.ns / n.n AS ex FROM nl, ns, n)
         |SELECT n_langs, n_sources, (n_langs - 1) * (n_sources - 1) AS dof,
         |  round(sum(pow(coalesce(o, 0) - ex, 2) / ex), 4) AS chi2
         |FROM grid LEFT JOIN obs USING (lang, source), dims
         |GROUP BY n_langs, n_sources""".stripMargin

  // ---------------------------------------------------------------- K14
  /** Curriculum plan: partition the corpus into 4 difficulty phases by
    * bigram-LM surprisal (B11) and emit each phase's document count,
    * token budget, and surprisal range — the easy→hard schedule a
    * curriculum-learning run feeds its data loader.
    *
    * 100 TB shape: phase boundaries come from ONE bounded aggregate
    * (three quartile cutpoints over the per-doc scores — at production
    * scale `approx_percentile`, here exact `percentile` so the oracle
    * replays bit-for-bit), broadcast back for a MAP-ONLY phase
    * assignment — never a global sort/ntile, whose total order is the
    * classic scale trap. Cutpoints and scores are both 6-dp-rounded
    * before comparison, so the phase boundaries are engine-exact
    * (Spark `percentile` ↔ DuckDB `quantile_cont`, the A15-proven
    * pair). Token budget counts n_bigrams+1 per doc (= its token
    * count for any doc with at least one bigram — B11's domain).
    */
  def qCurriculumPlan(spark: SparkSession, dir: String): DataFrame = {
    val s = qBigramSurprisal(spark, dir)
      .select(col("doc_id"), col("n_bigrams"),
        col("mean_bigram_surprisal").as("s"))
    val cuts = s.agg(
      // round(s,6) is a value no-op (s is 6-dp from B11) that makes
      // the SURVEY §5 quantize-before-percentile contract explicit
      round(expr("percentile(round(s, 6), 0.25)"), 6).as("c1"),
      round(expr("percentile(round(s, 6), 0.5)"), 6).as("c2"),
      round(expr("percentile(round(s, 6), 0.75)"), 6).as("c3"))
    s.crossJoin(broadcast(cuts))
      .withColumn("phase",
        when(col("s") <= col("c1"), 1L).when(col("s") <= col("c2"), 2L)
          .when(col("s") <= col("c3"), 3L).otherwise(4L))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams") + 1).cast("long").as("token_budget"),
        round(min(col("s")), 6).as("surprisal_lo"),
        round(max(col("s")), 6).as("surprisal_hi"))
  }

  val qCurriculumPlanSql: String =
    raw"""WITH s0 AS ($qBigramSurprisalSql),
         |s AS (SELECT doc_id, n_bigrams, mean_bigram_surprisal AS s FROM s0),
         |cuts AS (SELECT round(CAST(quantile_cont(round(s, 6), 0.25) AS DOUBLE), 6) AS c1,
         |    round(CAST(quantile_cont(round(s, 6), 0.5) AS DOUBLE), 6) AS c2,
         |    round(CAST(quantile_cont(round(s, 6), 0.75) AS DOUBLE), 6) AS c3 FROM s)
         |SELECT CAST(CASE WHEN s <= c1 THEN 1 WHEN s <= c2 THEN 2
         |    WHEN s <= c3 THEN 3 ELSE 4 END AS BIGINT) AS phase,
         |  count(*) AS n_docs,
         |  CAST(sum(n_bigrams + 1) AS BIGINT) AS token_budget,
         |  round(min(s), 6) AS surprisal_lo,
         |  round(max(s), 6) AS surprisal_hi
         |FROM s, cuts GROUP BY 1""".stripMargin

  // ------------------------------------------------------ K9 streaming kit
  /** Quantized quality histogram of any documents-shaped frame —
    * ≤ 10⁴+1 bins at any size (the K9 device), so it broadcasts.
    */
  private def qualityBins(docs: DataFrame): DataFrame =
    TextAnalysis.scoreQuality(docs)
      .select(round(col("quality"), 4).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))

  /** The accepted-corpus baseline the streaming drift monitor compares
    * arriving batches against: train-side quantized quality bins.
    * Computed once per monitor start; bounded, cacheable.
    */
  def baselineQualityBins(spark: SparkSession, dir: String): DataFrame = {
    val isEval = col("source").isin(Dedup.EvalSources.map(x => x: Any): _*)
    qualityBins(Tables.documents(spark, dir).filter(!isEval))
  }

  /** Exact KS D between a stored baseline histogram and one arriving
    * batch — the same bounded-bin CDF window as [[qQualityDrift]], so
    * a single batch holding the whole eval split reproduces the batch
    * operator's verdict exactly (spec-asserted in StreamingSpec).
    */
  def qualityDriftVsBaseline(baseline: DataFrame, batch: DataFrame): DataFrame = {
    val bins = baseline
      .select(col("bin"), col("n").as("n_train_b"), lit(0L).as("n_eval_b"))
      .unionAll(qualityBins(batch)
        .select(col("bin"), lit(0L).as("n_train_b"), col("n").as("n_eval_b")))
      .groupBy(col("bin"))
      .agg(sum(col("n_train_b")).as("n_train_b"), sum(col("n_eval_b")).as("n_eval_b"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bins.agg(sum(col("n_train_b")).as("n_train"),
      sum(col("n_eval_b")).as("n_eval"))
    bins
      .withColumn("cum_train", sum(col("n_train_b")).over(w))
      .withColumn("cum_eval", sum(col("n_eval_b")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("n_train")).as("n_train"), max(col("n_eval")).as("n_eval"),
        max(abs(col("cum_train").cast("double") / col("n_train") -
          col("cum_eval").cast("double") / col("n_eval"))).as("d"))
      // an empty side has no CDF: emit a typed null instead of the NaN
      // the 0-division would produce (streaming callers additionally
      // skip writing empty batches — see streamQualityDriftToFiles)
      .select(col("n_train"), col("n_eval"),
        when(col("n_train") > 0 && col("n_eval") > 0, round(col("d"), 6))
          .otherwise(lit(null).cast("double")).as("ks_d"))
  }

  val qQualityDriftSql: String = {
    val evalList = Dedup.EvalSources.map(s => s"'$s'").mkString(", ")
    raw"""WITH t AS (SELECT doc_id,
         |  CAST(len($duckToks) AS DOUBLE) AS n_tokens,
         |  CAST(len(list_filter($duckToks, t -> list_contains(${TextAnalysis.stopSqlEn}, t))) AS DOUBLE) AS stop_hits,
         |  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS n_punct,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  source IN ($evalList) AS is_eval
         |FROM documents),
         |q AS (SELECT is_eval, round(round(
         |    (stop_hits / n_tokens) * 0.4 + least(1.0, n_tokens / 100.0) * 0.3 +
         |    (1.0 - n_punct / n_chars) * 0.3, 6), 4) AS bin FROM t),
         |b AS (SELECT bin,
         |    sum(CASE WHEN NOT is_eval THEN 1 ELSE 0 END) AS n_train_b,
         |    sum(CASE WHEN is_eval THEN 1 ELSE 0 END) AS n_eval_b
         |  FROM q GROUP BY bin),
         |c AS (SELECT
         |    sum(n_train_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_train,
         |    sum(n_eval_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_eval,
         |    sum(n_train_b) OVER () AS n_train, sum(n_eval_b) OVER () AS n_eval
         |  FROM b)
         |SELECT CAST(max(n_train) AS BIGINT) AS n_train,
         |  CAST(max(n_eval) AS BIGINT) AS n_eval,
         |  round(max(abs(CAST(cum_train AS DOUBLE) / n_train -
         |    CAST(cum_eval AS DOUBLE) / n_eval)), 6) AS ks_d
         |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- K7
  /** Curriculum decile binning: documents bucketed into quality
    * deciles WITHOUT a global sort — the 9 exact interpolated cut
    * points come out of one aggregate (a bounded 9-value row that
    * broadcasts), and every doc's decile is then a map-side
    * comparison count against them. ntile() would need a
    * single-partition global sort; this shape is the 100 TB way to
    * rank-bucket. Output is the per-decile profile. Both engines
    * compare the identical rounded quality doubles against identical
    * percentile boundaries, so binning is deterministic.
    */
  def qQualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qQualityScore(spark, dir).select(col("doc_id"), col("quality"))
    val cuts = q.agg(
      // round(quality,6) is a no-op (B3 rounds at 6 dp) made explicit
      // for the §5 quantize-before-percentile guard
      expr("percentile(round(quality, 6), array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("cuts"))
    val decile = (lit(1) +
      (0 until 9).map(i => when(col("quality") > col("cuts").getItem(i), 1).otherwise(0))
        .reduce(_ + _)).cast("long")
    q.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("quality"), decile.as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("quality")), 6).as("min_q"),
        round(max(col("quality")), 6).as("max_q"))
  }

  val qQualityDecilesSql: String = {
    val qualSql = TextAnalysis.qQualityScoreSql
    val cmp = (0 until 9)
      .map(i => s"(CASE WHEN quality > cuts[${i + 1}] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH q AS (SELECT doc_id, quality FROM ($qualSql)),
       |c AS (SELECT quantile_cont(round(quality, 6), [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM q),
       |d AS (SELECT doc_id, quality, CAST(1 + $cmp AS BIGINT) AS decile FROM q, c)
       |SELECT decile, count(*) AS n_docs,
       |  round(min(quality), 6) AS min_q, round(max(quality), 6) AS max_q
       |FROM d GROUP BY decile""".stripMargin
  }

  // ---------------------------------------------------------------- F14
  /** Cohort retention: users grouped by first-activity week (the
    * cohort), tracked by the share still active k weeks later — the
    * standard product-analytics staple. Shape: one shuffle on user_id
    * (first-week aggregate), one distinct on (user, week) — both
    * partial-aggregated map-side — then a broadcast-sized
    * (cohort × k) rollup joined to cohort sizes. Weeks are epoch-
    * aligned 7-day buckets (engine-portable integer arithmetic).
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val wk = (expr("(ts DIV 1000000000) DIV 604800") * 604800L).cast("long")
    val userWeeks = Tables.events(spark, dir)
      .select(col("user_id"), wk.as("week")).distinct()
    val cohorts = userWeeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    userWeeks.join(cohorts, "user_id")
      .select(col("cohort_week"),
        expr("(week - cohort_week) DIV 604800").as("k"))
      .groupBy(col("cohort_week"), col("k"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("k"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  val qRetentionSql: String =
    s"""WITH uw AS (SELECT DISTINCT user_id,
       |    ($duckTsSec // 604800) * 604800 AS week FROM events),
       |c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
       |s AS (SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY cohort_week),
       |a AS (SELECT c.cohort_week, (uw.week - c.cohort_week) // 604800 AS k,
       |    count(*) AS n_active
       |  FROM uw JOIN c ON uw.user_id = c.user_id
       |  GROUP BY 1, 2)
       |SELECT a.cohort_week, a.k, a.n_active, s.cohort_size,
       |  round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
       |FROM a JOIN s ON a.cohort_week = s.cohort_week""".stripMargin

  // ---------------------------------------------------------------- K13
  /** The end-to-end training-corpus pipeline as ONE composed query —
    * the product story the individual gates add up to: documents →
    * quality/exact-dup gate (B7 semantics) → near-dup +
    * decontamination keep list (C11) → deterministic train split
    * (K2's md5 bucket) → per-source-shard sequence packing (K1).
    * Output: the packed TRAIN manifest (one row per surviving train
    * doc with its token offset and context-window chunk span).
    *
    * Composition contract (spec-asserted in PipelineSpec): every
    * text-derived per-document fact the pipeline needs (fingerprint,
    * quality, token count, split bucket) is computed in ONE cached
    * projection over ONE scan of documents — the final plan re-reads
    * no text. The C11 gate rides Dedup's cached MinHash signature
    * pipeline (its own single text materialization, shared by the
    * near-dup and contamination gates), so a cold session reads the
    * corpus payload exactly twice (facts + signatures), warm sessions
    * zero times — nothing re-shuffles an already-keyed frame.
    *
    * Eval-source documents are out of domain by construction (the C11
    * keep list covers the TRAIN side only), and the bucket < 80 cut
    * keeps the train split of K2's 80/10/10.
    */
  def qPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % 100
    val nTokD = tokenCount(col("text")).cast("double")
    // identical arithmetic (same ops, same order) as TextAnalysis
    // .scoreQuality — divergence would break oracle parity with B7
    val quality = round(
      (vocabHits(tokens(col("text")), TextAnalysis.stopwords("en")).cast("double") / nTokD) * 0.4 +
        least(lit(1.0), nTokD / 100.0) * 0.3 +
        (lit(1.0) - length(regexp_replace(col("text"), "[^.,!?;:]", ""))
          .cast("double") / length(col("text")).cast("double")) * 0.3, 6)
    val facts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        fingerprint(col("text")).as("fp"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        quality.as("quality"),
        bucket.as("bucket"))
      .cache()
    facts.count() // materialize before the two-consumer fan-out
    val canon = facts.groupBy(col("fp")).agg(min(col("doc_id")).as("canonical_id"))
    val b7 = facts.join(canon, "fp")
      .filter(col("doc_id") === col("canonical_id") &&
        col("quality") >= TextAnalysis.QualityFloor)
    val c11 = Dedup.qDecontamKeepList(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    val surv = b7.join(c11, Seq("doc_id"), "left_semi")
      .filter(col("bucket") < 80)
      .select(col("doc_id"), col("source"), col("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    surv.withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset DIV $CtxTokens").as("first_chunk"),
        expr(s"(tok_offset + n_tokens - 1) DIV $CtxTokens").as("last_chunk"))
  }

  val qPipelineE2eSql: String =
    raw"""WITH facts AS (SELECT doc_id, source,
         |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
         |  FROM documents),
         |q AS (SELECT doc_id, quality FROM (${graft.operators.TextAnalysis.qQualityScoreSql}) qq),
         |c11 AS (SELECT doc_id FROM (${Dedup.qDecontamKeepListSql}) cc WHERE keep),
         |canon AS (SELECT fp, min(doc_id) AS canonical_id FROM facts GROUP BY fp),
         |surv AS (SELECT f.doc_id, f.source, f.n_tokens
         |  FROM facts f JOIN canon c ON f.fp = c.fp
         |  JOIN q ON q.doc_id = f.doc_id
         |  JOIN c11 ON c11.doc_id = f.doc_id
         |  WHERE f.doc_id = c.canonical_id
         |    AND q.quality >= ${TextAnalysis.QualityFloor} AND f.bucket < 80),
         |o AS (SELECT doc_id, source, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
         |  FROM surv)
         |SELECT doc_id, source, n_tokens, tok_offset,
         |  tok_offset // $CtxTokens AS first_chunk,
         |  (tok_offset + n_tokens - 1) // $CtxTokens AS last_chunk
         |FROM o""".stripMargin

  // ---------------------------------------------------------------- K16
  /** Training-shard manifest: the deterministic md5-bucket shard
    * assignment (K2's device widened to [[NShards]] output shards — the
    * writer layout of a packed corpus) audited per shard: doc count,
    * token mass, source diversity, and `load_factor` (token share ÷
    * uniform). Hash sharding is the ONLY shard assignment that needs
    * no global sort and no coordination at any corpus size — this
    * manifest is the audit that proves the resulting layout balanced
    * (feed it to the trainer's data loader as the shard index). All
    * map-side until the [[NShards]]-row aggregate; totals broadcast
    * back for the load factor.
    */
  val NShards = 32

  def qShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val shard =
      (expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % NShards).as("shard")
    val per = Tables.documents(spark, dir)
      .select(shard, col("source"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_sources"),
        round(col("n_tokens").cast("double") * NShards / col("total_tokens"), 6)
          .as("load_factor"))
  }

  val qShardManifestSql: String =
    raw"""WITH d AS (SELECT
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $NShards AS shard,
         |    source, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
         |per AS (SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    count(DISTINCT source) AS n_sources FROM d GROUP BY shard),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per)
         |SELECT shard, n_docs, n_tokens, n_sources,
         |  round(CAST(n_tokens AS DOUBLE) * $NShards / total_tokens, 6) AS load_factor
         |FROM per, tot""".stripMargin

  // ---------------------------------------------------------------- K29
  /** Inference-batch padding waste under three bucketing policies —
    * the SERVING-side cost table (K17 prices training concat-packing,
    * where the only waste is shard tails; batched inference pads
    * every sequence to its batch maximum, so the bucketing policy IS
    * the cost): `global` (no length bucketing, FIFO by doc_id),
    * `bucket64` / `bucket256` (length-bucketed by token-count DIV
    * width, then length-sorted within bucket). Batches of 16 form by
    * row_number DIV 16 within (policy, bucket) ordered by (n_tokens,
    * doc_id) — deterministic in both engines; per batch the padded
    * cost is cnt·max − Σlen, all EXACT integers until the one final
    * waste-share division. One token-count pass, a 3× policy explode
    * on per-doc arithmetic rows (never text), partitioned windows,
    * 3-row output. The table a serving stack reads to size its
    * bucketing.
    */
  def qPaddingWaste(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
    val pol = d.select(col("doc_id"), col("n_tokens"),
      explode(array(lit("global"), lit("bucket64"), lit("bucket256")))
        .as("policy"))
      .withColumn("bucket",
        when(col("policy") === "global", lit(0L))
          .when(col("policy") === "bucket64", expr("n_tokens DIV 64"))
          .otherwise(expr("n_tokens DIV 256")))
    val batched = pol
      .withColumn("batch", expr("(row_number() OVER (PARTITION BY policy, bucket " +
        "ORDER BY n_tokens, doc_id) - 1) DIV 16"))
    val perBatch = batched.groupBy(col("policy"), col("bucket"), col("batch"))
      .agg(count(lit(1)).as("cnt"), max(col("n_tokens")).as("mx"),
        sum(col("n_tokens")).as("tok"))
    perBatch.groupBy(col("policy"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("tok")).as("real_tokens"),
        sum(col("cnt") * col("mx") - col("tok")).as("pad_tokens"))
      .select(col("policy"), col("n_batches"), col("real_tokens"),
        col("pad_tokens"),
        round(col("pad_tokens") / (col("real_tokens") + col("pad_tokens"))
          .cast("double"), 6).as("waste_share"))
  }

  val qPaddingWasteSql: String =
    raw"""WITH d AS (SELECT doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
         |pol AS (SELECT doc_id, n_tokens,
         |    unnest(['global', 'bucket64', 'bucket256']) AS policy
         |  FROM d),
         |b AS (SELECT *, CASE WHEN policy = 'global' THEN 0
         |    WHEN policy = 'bucket64' THEN n_tokens // 64
         |    ELSE n_tokens // 256 END AS bucket FROM pol),
         |nb AS (SELECT *, (row_number() OVER (PARTITION BY policy, bucket
         |    ORDER BY n_tokens, doc_id) - 1) // 16 AS batch FROM b),
         |pb AS (SELECT policy, bucket, batch, count(*) AS cnt,
         |    max(n_tokens) AS mx, CAST(sum(n_tokens) AS BIGINT) AS tok
         |  FROM nb GROUP BY 1, 2, 3)
         |SELECT policy, count(*) AS n_batches,
         |  CAST(sum(tok) AS BIGINT) AS real_tokens,
         |  CAST(sum(cnt * mx - tok) AS BIGINT) AS pad_tokens,
         |  round(CAST(sum(cnt * mx - tok) AS BIGINT)
         |    / CAST(CAST(sum(tok) AS BIGINT)
         |      + CAST(sum(cnt * mx - tok) AS BIGINT) AS DOUBLE), 6)
         |    AS waste_share
         |FROM pb GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- K17
  /** Packing-efficiency sweep: the K1 concat-and-chunk layout costed
    * at four candidate context lengths in one query — per context:
    * chunk count, tail-pad tokens (the only waste in a split-docs
    * packing: each source shard pads once, at its final chunk), pad
    * fraction, and how many documents get split across a chunk
    * boundary (the attention-mask/document-boundary cost). This is
    * the table a trainer reads to pick the context length — waste
    * falls and splits rise monotonically with ctx, and this query
    * prices both sides. One token-count pass + the K1 offset window
    * per source shard; the 4× explode happens on per-doc ARITHMETIC
    * rows (not text) and both aggregates are 4-row bounded.
    */
  val PackCtxs: Seq[Int] = Seq(256, 512, 1024, 2048)

  def qPackingEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = d.withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    val ctxArr = array(PackCtxs.map(c => lit(c.toLong)): _*)
    val splits = off
      .select(col("n_tokens"), col("tok_offset"), explode(ctxArr).as("ctx"))
      .groupBy(col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("tok_offset DIV ctx") =!= expr("(tok_offset + n_tokens - 1) DIV ctx"),
          1L).otherwise(0L)).as("n_docs_split"))
    val shardT = off.groupBy(col("source")).agg(sum(col("n_tokens")).as("t"))
    val pads = shardT
      .select(col("t"), explode(ctxArr).as("ctx"))
      .groupBy(col("ctx"))
      .agg(sum(expr("(t + ctx - 1) DIV ctx")).as("n_chunks"),
        sum(col("t")).as("total_tokens"),
        sum(expr("((t + ctx - 1) DIV ctx) * ctx - t")).as("pad_tokens"))
    pads.join(splits, "ctx")
      .select(col("ctx"), col("n_chunks"), col("total_tokens"), col("pad_tokens"),
        round(col("pad_tokens").cast("double") / (col("n_chunks") * col("ctx")), 6)
          .as("pad_fraction"),
        col("n_docs"), col("n_docs_split"))
  }

  val qPackingEfficiencySql: String =
    raw"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
         |  FROM d),
         |cx AS (SELECT unnest([256, 512, 1024, 2048]::BIGINT[]) AS ctx),
         |splits AS (SELECT ctx, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN tok_offset // ctx <> (tok_offset + n_tokens - 1) // ctx
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_split
         |  FROM o, cx GROUP BY ctx),
         |st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t FROM o GROUP BY source),
         |pads AS (SELECT ctx, CAST(sum((t + ctx - 1) // ctx) AS BIGINT) AS n_chunks,
         |    CAST(sum(t) AS BIGINT) AS total_tokens,
         |    CAST(sum(((t + ctx - 1) // ctx) * ctx - t) AS BIGINT) AS pad_tokens
         |  FROM st, cx GROUP BY ctx)
         |SELECT pads.ctx, n_chunks, total_tokens, pad_tokens,
         |  round(CAST(pad_tokens AS DOUBLE) / (n_chunks * pads.ctx), 6) AS pad_fraction,
         |  n_docs, n_docs_split
         |FROM pads JOIN splits ON pads.ctx = splits.ctx""".stripMargin

  // ---------------------------------------------------------------- K18
  /** Held-out surprisal — the generalization/leak gap: the B11 bigram
    * LM fitted on the TRAIN split only (K2's md5 buckets), scoring
    * BOTH splits; one row per split with mean surprisal. Healthy data
    * shows test > train (the LM has not seen the test docs); a
    * near-zero gap on a corpus with known near-dups is the
    * fingerprint of eval leakage — this query is the cheap monitor
    * that C11's decontamination actually worked, run after every
    * corpus rebuild. Unseen eval bigrams/histories take the add-one
    * floor via LEFT joins (p = 1/V at worst, no special cases).
    * Shape: same as B11 (lead-window bigrams, shuffle joins on bigram
    * keys, one-row V broadcast), plus only the map-side split tag.
    */
  def qHeldoutSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % 100
    // split is a pure function of doc_id, so it rides the SHARED token
    // stream as a map-side projection instead of forcing a private
    // re-tokenization
    val toks = TextAnalysis.tokenStream(spark, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("split"), col("tok").as("w1"), col("nxt").as("w2"))
    val trainBg = bg.filter(col("split") === "train")
    val bgc = trainBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val hist = bgc.groupBy(col("w1")).agg(sum(col("c12")).as("h1"))
    val vsz = toks.filter(col("split") === "train")
      .select(col("tok")).distinct().agg(count(lit(1)).as("v"))
    bg.filter(col("split").isin("train", "test"))
      .join(bgc, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .crossJoin(broadcast(vsz))
      .groupBy(col("split"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_bigrams"),
        round(avg(-log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("h1"), lit(0L)) + col("v")).cast("double"))), 6)
          .as("mean_surprisal"))
  }

  val qHeldoutSurprisalSql: String =
    raw"""WITH t AS (SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
         |      THEN 'train'
         |      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
         |      THEN 'val' ELSE 'test' END AS split,
         |    $duckToks AS toks FROM documents),
         |bgs AS (SELECT doc_id, split,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM t),
         |bgc AS (SELECT w1, w2, count(*) AS c12 FROM bgs WHERE split = 'train' GROUP BY 1, 2),
         |hist AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS h1 FROM bgc GROUP BY 1),
         |vsz AS (SELECT count(DISTINCT tok) AS v
         |  FROM (SELECT unnest(toks) AS tok FROM t WHERE split = 'train'))
         |SELECT split, count(DISTINCT doc_id) AS n_docs, count(*) AS n_bigrams,
         |  round(avg(-ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE) / (coalesce(h1, 0) + v))), 6)
         |    AS mean_surprisal
         |FROM bgs LEFT JOIN bgc USING (w1, w2) LEFT JOIN hist USING (w1), vsz
         |WHERE split IN ('train', 'test')
         |GROUP BY split""".stripMargin

  // ---------------------------------------------------------------- K18
  /** Gini coefficient of the per-doc character-budget distribution
    * within each source — the concentration audit behind "is this
    * source's token budget carried by a few giant documents?" (a
    * high-Gini source deduplicates and caps very differently from a
    * uniform one). Rank-sum formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx)
    * over docs ranked by (n_chars, doc_id): every sum is exact
    * integer arithmetic — the single rounding is the final division.
    * One shuffle on source for the rank window, then a per-source
    * reduction; at 100 TB parallelism is the source count × the
    * window's internal sort, with nothing driver-side.
    */
  def qGiniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round((lit(2.0) * sum(col("i") * col("n_chars")) -
          (count(lit(1)) + lit(1)) * sum(col("n_chars"))) /
          (count(lit(1)) * sum(col("n_chars"))), 6).as("gini"))
  }

  val qGiniConcentrationSql: String =
    """WITH r AS (SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars ASC, doc_id ASC) AS i
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  round((2.0 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars))
      |    / (count(*) * sum(n_chars)), 6) AS gini
      |FROM r GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- K19
  /** Population-stability index of the event-value distribution,
    * first half vs second half of the stream's time range — the
    * score-drift monitor (companion to K9's KS test) that bins both
    * windows into 10 fixed-width bins over the global [min, max] and
    * sums (p−q)·ln(p/q) with +1 Laplace smoothing (so empty bins
    * never divide by zero). The boundary (midpoint second) and bin
    * edges come from ONE global aggregate, broadcast back — exact
    * integer time arithmetic, bin ratios 6-dp-rounded before floor so
    * a knife-edge value bins identically in both engines. Per-bin
    * exact counts; contributions rounded then summed over the
    * 10-row bounded set. PSI > 0.2 is the conventional drift flag.
    */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(expr("ts DIV 1000000000").cast("long").as("t"), col("value"))
    val stats = e.agg(
      expr("(min(t) + max(t)) DIV 2").as("t_mid"),
      round(min(col("value")), 6).as("vmin"),
      round(max(col("value")), 6).as("vmax"))
    val binned = e.crossJoin(broadcast(stats))
      .withColumn("half", when(col("t") <= col("t_mid"), "first").otherwise("second"))
      .withColumn("bin", least(
        floor(round((col("value") - col("vmin")) /
          ((col("vmax") - col("vmin")) / 10.0), 6)).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(sum(when(col("half") === "first", 1L).otherwise(0L)).as("c_first"),
        sum(when(col("half") === "second", 1L).otherwise(0L)).as("c_second"))
    val tot = binned.agg(sum(col("c_first")).as("n_first"),
      sum(col("c_second")).as("n_second"))
    binned.crossJoin(broadcast(tot))
      .withColumn("p_first", (col("c_first") + 1) / (col("n_first") + 10))
      .withColumn("p_second", (col("c_second") + 1) / (col("n_second") + 10))
      .withColumn("contrib", round((col("p_first") - col("p_second")) *
        log(col("p_first") / col("p_second")), 6))
      .groupBy()
      .agg(max(col("n_first")).as("n_first"),
        max(col("n_second")).as("n_second"),
        round(sum(col("contrib")), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
  }

  val qPsiDriftSql: String =
    """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, value FROM events),
      |s AS (SELECT (min(t) + max(t)) // 2 AS t_mid,
      |    round(min(value), 6) AS vmin, round(max(value), 6) AS vmax FROM e),
      |b AS (SELECT least(CAST(floor(round((value - vmin)
      |      / ((vmax - vmin) / 10.0), 6)) AS BIGINT), 9) AS bin,
      |    CASE WHEN t <= t_mid THEN 'first' ELSE 'second' END AS half
      |  FROM e, s),
      |c AS (SELECT bin,
      |    CAST(sum(CASE WHEN half = 'first' THEN 1 ELSE 0 END) AS BIGINT) AS c_first,
      |    CAST(sum(CASE WHEN half = 'second' THEN 1 ELSE 0 END) AS BIGINT) AS c_second
      |  FROM b GROUP BY bin),
      |t AS (SELECT CAST(sum(c_first) AS BIGINT) AS n_first,
      |    CAST(sum(c_second) AS BIGINT) AS n_second FROM c),
      |p AS (SELECT c_first, c_second, n_first, n_second,
      |    (c_first + 1) / CAST(n_first + 10 AS DOUBLE) AS p_first,
      |    (c_second + 1) / CAST(n_second + 10 AS DOUBLE) AS p_second
      |  FROM c, t)
      |SELECT max(n_first) AS n_first, max(n_second) AS n_second,
      |  round(sum(round((p_first - p_second) * ln(p_first / p_second), 6)), 6) AS psi,
      |  (round(sum(round((p_first - p_second) * ln(p_first / p_second), 6)), 6) > 0.2)
      |    AS drifted
      |FROM p""".stripMargin

  // ---------------------------------------------------------------- K20
  /** Deterministic source-interleave audit: docs take a stable
    * within-source order (md5 rank — the K2/K6 shuffle device), each
    * rank r of n maps to epoch position (2r−1)/(2n), and the audit
    * proves every source spreads uniformly across the epoch — the
    * data-ORDER half of mixture training that K3's data-VOLUME
    * weights don't cover (a source clumped at the epoch tail trains
    * as badly as one over-weighted). Position deciles are computed in
    * EXACT integer arithmetic — bin = ((2r−1)·10) div (2n) — so the
    * uniformity verdict (each source×bin count within the floor/ceil
    * of n/10) can never ride a float knife-edge. One source-
    * partitioned rank window, then a |sources|×10 bounded aggregate.
    */
  def qInterleaveSchedule(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n_s", count(lit(1))
        .over(Window.partitionBy(col("source"))))
      .withColumn("bin", expr("((2 * r - 1) * 10) DIV (2 * n_s)"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"), max(col("n_s")).as("n_source"))
      .withColumn("uniform_ok",
        col("n") >= expr("n_source DIV 10") &&
          col("n") <= expr("n_source DIV 10 + 1"))
  }

  val qInterleaveScheduleSql: String =
    """WITH r AS (SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS n_s
      |  FROM documents),
      |c AS (SELECT source, ((2 * r - 1) * 10) // (2 * n_s) AS bin,
      |    count(*) AS n, max(n_s) AS n_source
      |  FROM r GROUP BY 1, 2)
      |SELECT source, bin, n, CAST(n_source AS BIGINT) AS n_source,
      |  (n >= n_source // 10 AND n <= n_source // 10 + 1) AS uniform_ok
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- K9
  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * A-Res), the principled way to bias a training mix toward long
    * documents without a global sort over raw weights: each doc draws
    * a deterministic md5 uniform u and competes on ln(u)/w (monotone
    * twin of u^(1/w)) with w = n_chars; the top-5 per language BY KEY
    * are exactly a weight-proportional without-replacement draw. One
    * map-side key computation + one per-lang top-k window — the
    * WindowGroupLimit path prunes to k rows per partition before the
    * sort, so the shuffle carries candidates, not the corpus. Keys
    * round at 10 dp before ranking (ln parity across engines) with
    * doc_id tiebreak; the u=0 measure-zero edge floors at 1e-18 (the
    * L6 device). Deterministic ⇒ oracle-replayable; a production
    * sampler swaps fresh randomness into the SAME plan. The oracle
    * parses the 15-char md5 prefix with an explicit hex-digit fold
    * (strpos + bit-shift, exact BIGINT math) rather than the
    * `('0x'||h)::BIGINT` cast, which only newer DuckDB releases
    * accept — an old oracle binary must mismatch, not error.
    */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("sample_key").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("u", greatest(
        expr("conv(substring(md5(concat('ws_', cast(doc_id as string))), 1, 15), 16, 10)")
          .cast("long") / lit(1152921504606846976.0), lit(1e-18)))
      .withColumn("sample_key", round(log(col("u")) / col("n_chars"), 10))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 5)
      .select(col("lang"), col("sample_rank"), col("doc_id"),
        col("n_chars"), col("sample_key"))
  }

  val qWeightedSampleSql: String =
    """WITH k AS (SELECT lang, doc_id, n_chars,
      |    round(ln(greatest(
      |        list_sum(list_transform(range(1, 16), i ->
      |            (strpos('0123456789abcdef', substr(
      |                md5('ws_' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
      |              * (1::BIGINT << CAST((15 - i) * 4 AS INT))))
      |          / 1152921504606846976.0, 1e-18)) / n_chars, 10) AS sample_key
      |  FROM documents),
      |r AS (SELECT lang, doc_id, n_chars, sample_key,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY sample_key DESC, doc_id ASC) AS sample_rank
      |  FROM k)
      |SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id,
      |  n_chars, sample_key
      |FROM r WHERE sample_rank <= 5""".stripMargin

  // ---------------------------------------------------------------- K28
  /** Quality–volume trade-off curve: for each candidate quality
    * floor, the documents and token mass the corpus would keep — the
    * frontier a data team reads before picking B3's production floor
    * (raise the bar for cleaner data, and THIS is exactly how much
    * training volume it costs). The floor grid is the fixed decile
    * set 0.0,0.1,…,0.9; each doc's (quality, n_tokens) pair streams
    * once into a broadcast-grid fan-out and one keyed aggregate —
    * never a re-scan per threshold; quality comparisons are on the
    * 6-dp-rounded published score (identical IEEE values both
    * engines), counts exact integers, two 6-dp fraction divisions at
    * publish. 10 output rows, monotone by construction (spec-pinned).
    */
  def qQualityTradeoff(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qQualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok")),
        "doc_id")
    val tot = scored.agg(count(lit(1)).as("docs_total"),
      sum(col("n_tok")).cast("long").as("tokens_total"))
    val grid = scored.sparkSession.range(0, 10)
      .select((col("id") / lit(10.0)).as("floor"))
    scored.crossJoin(broadcast(grid))
      .filter(col("quality") >= col("floor"))
      .groupBy(col("floor"))
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("n_tok")).cast("long").as("tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(col("floor"), col("docs_kept"), col("tokens_kept"),
        round(col("docs_kept").cast("double") / col("docs_total"), 6)
          .as("doc_frac"),
        round(col("tokens_kept").cast("double") / col("tokens_total"), 6)
          .as("token_frac"))
  }

  val qQualityTradeoffSql: String =
    raw"""WITH q AS (${TextAnalysis.qQualityScoreSql}),
         |toks AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |scored AS (SELECT q.doc_id, q.quality, t.n_tok
         |  FROM q JOIN toks t ON q.doc_id = t.doc_id),
         |tot AS (SELECT count(*) AS docs_total,
         |    CAST(sum(n_tok) AS BIGINT) AS tokens_total FROM scored),
         |grid AS (SELECT unnest(generate_series(0, 9)) / 10.0 AS floor)
         |SELECT floor, count(*) AS docs_kept,
         |  CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
         |  round(CAST(count(*) AS DOUBLE) / max(docs_total), 6) AS doc_frac,
         |  round(CAST(sum(n_tok) AS DOUBLE) / max(tokens_total), 6)
         |    AS token_frac
         |FROM scored JOIN grid ON quality >= floor, tot
         |GROUP BY floor""".stripMargin

  // ---------------------------------------------------------------- K24
  /** Jensen–Shannon divergence of each source's token distribution
    * from the corpus mixture — the bounded, symmetric drift number
    * K19's PSI (binned values) and K12's χ² (independence verdict)
    * don't give for TEXT: JSD ∈ [0, ln 2] says how far a source's
    * unigram profile sits from what the model will actually train on,
    * comparable across corpora and stable when a token is absent on
    * either side (KL is infinite there; the ½(P+M) mixture never is).
    * Construction mirrors L15's full-grid discipline: the |vocab| ×
    * |sources| grid materializes absent cells (a source missing a
    * token still pays ½·q·ln 2 — dropping those cells silently
    * understates divergence), counts are exact integers, per-cell
    * contributions round at 10 dp before the per-source 6-dp sum.
    * Plan: one (source, tok) keyed aggregate, two bounded side
    * aggregates broadcast-crossed — the corpus streams once; every
    * later frame is vocab-bounded, not corpus-bounded.
    */
  def qJsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val bySrcTok = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val byTok = bySrcTok.groupBy(col("tok"))
      .agg(sum(col("c_st")).cast("long").as("c_t"))
    val bySrc = bySrcTok.groupBy(col("source"))
      .agg(sum(col("c_st")).cast("long").as("n_s"))
    val tot = byTok.agg(sum(col("c_t")).cast("long").as("n"))
    val grid = bySrc.crossJoin(broadcast(byTok)).crossJoin(broadcast(tot))
      .join(bySrcTok, Seq("source", "tok"), "left")
      .withColumn("p", coalesce(col("c_st"), lit(0L)).cast("double") / col("n_s"))
      .withColumn("q", col("c_t").cast("double") / col("n"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("contrib", round(
        when(col("p") > 0, col("p") / 2 * log(col("p") / col("m")))
          .otherwise(lit(0.0)) +
          when(col("q") > 0, col("q") / 2 * log(col("q") / col("m")))
            .otherwise(lit(0.0)), 10))
    grid.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        round(sum(col("contrib")), 6).as("jsd_nats"))
      .withColumn("jsd_bits", round(col("jsd_nats") / log(lit(2.0)), 6))
      .withColumn("divergent", col("jsd_nats") > 0.05)
  }

  val qJsDivergenceSql: String =
    raw"""WITH toks AS (SELECT source, unnest($duckToks) AS tok FROM documents),
         |st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY 1, 2),
         |bt AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
         |bs AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
         |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM bt),
         |grid AS (SELECT bs.source, bt.tok, bs.n_s, bt.c_t, tot.n,
         |    CAST(coalesce(st.c_st, 0) AS DOUBLE) / bs.n_s AS p,
         |    CAST(bt.c_t AS DOUBLE) / tot.n AS q
         |  FROM bs CROSS JOIN bt CROSS JOIN tot
         |  LEFT JOIN st ON st.source = bs.source AND st.tok = bt.tok),
         |c AS (SELECT source, n_s,
         |    round((CASE WHEN p > 0 THEN p / 2 * ln(p / ((p + q) / 2))
         |        ELSE 0.0 END)
         |      + (CASE WHEN q > 0 THEN q / 2 * ln(q / ((p + q) / 2))
         |        ELSE 0.0 END), 10) AS contrib
         |  FROM grid),
         |agg AS (SELECT source, max(n_s) AS n_tokens,
         |    round(sum(contrib), 6) AS jsd_nats
         |  FROM c GROUP BY 1)
         |SELECT source, n_tokens, jsd_nats,
         |  round(jsd_nats / ln(2.0), 6) AS jsd_bits,
         |  (jsd_nats > 0.05) AS divergent
         |FROM agg""".stripMargin

  // ---------------------------------------------------------------- K33
  /** Data scaling curve — held-out surprisal as a function of
    * training-set size, the empirical scaling-law readout (Kaplan et
    * al. 2020 shape) that answers the budget question every corpus
    * decision feeds: is MORE of this data still buying loss? Nested
    * md5 training fractions (10/25/50/100 % of the K-family 80 %
    * train mass — prefixes of one bucket order, so each fraction is a
    * strict superset) each fit an add-1 unigram LM from ONE shared
    * (token × tier) aggregate; the held-out (test-split) tokens score
    * −ln((c_f+1)/(N_f+V_f)) per fraction (per-row libm ln then a
    * 6-dp-rounded mean — the B9/K16 device class), and the
    * loss-vs-size slope fits on the FOUR (ln N_f, surprisal) points
    * PIVOTED into one fixed-order closed-form expression (the F53
    * no-unordered-double-sum rule; ln N_f rounds at 10 dp first).
    * Scale shape: tokens and the tier-count vocabulary shuffle-join
    * on `tok` (vocab is corpus-scale — never force-broadcast, the B9
    * plan rule); only the 4-row totals broadcast. Verdict: slope < 0
    * ⟺ more data still helps.
    */
  def qScalingCurve(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
        .cast("long") % 100
    val toks = TextAnalysis.tokenStream(spark, dir)
      .withColumn("b", bucket)
    val fracs = Seq(8, 20, 40, 80) // % of corpus = 10/25/50/100 % of train
    // one (token) aggregate carries every fraction's counts + the
    // first tier each token appears in (for V_f)
    val vocabAggs = fracs.map(f =>
      sum(when(col("b") < f, 1L).otherwise(0L)).as(s"c$f")) :+
      min(col("b")).as("minb")
    val vocab = toks.filter(col("b") < 80)
      .groupBy(col("tok"))
      .agg(vocabAggs.head, vocabAggs.tail: _*)
    val totalAggs = fracs.flatMap(f => Seq(
      sum(col(s"c$f")).as(s"n$f"),
      sum(when(col("minb") < f, 1L).otherwise(0L)).as(s"v$f")))
    val totals = vocab.agg(totalAggs.head, totalAggs.tail: _*)
    val held = toks.filter(col("b") >= 90)
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
    val scoreAggs = count(lit(1)).as("n_held") +: fracs.map(f =>
      round(avg(-log(
        (coalesce(col(s"c$f"), lit(0L)) + lit(1)).cast("double") /
          (col(s"n$f") + col(s"v$f")).cast("double"))), 6)
        .as(s"ms$f"))
    val scored = held.groupBy(lit(1).as("g"))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    // slope over the four (x = round(ln N_f, 10), y = ms_f) points in
    // ONE fixed-order expression — never an unordered double sum
    val pts = scored.crossJoin(broadcast(totals))
    def x(f: Int) = round(log(col(s"n$f").cast("double")), 10)
    def y(f: Int) = col(s"ms$f")
    val xbar = (x(8) + x(20) + x(40) + x(80)) / 4
    val ybar = (y(8) + y(20) + y(40) + y(80)) / 4
    val num = (x(8) - xbar) * (y(8) - ybar) + (x(20) - xbar) * (y(20) - ybar) +
      (x(40) - xbar) * (y(40) - ybar) + (x(80) - xbar) * (y(80) - ybar)
    val den = (x(8) - xbar) * (x(8) - xbar) + (x(20) - xbar) * (x(20) - xbar) +
      (x(40) - xbar) * (x(40) - xbar) + (x(80) - xbar) * (x(80) - xbar)
    val slope = round(num / den, 6)
    import spark.implicits._
    val rows = fracs.toDF("f")
    pts.crossJoin(broadcast(rows))
      .select(
        (col("f") * 100 / 80).cast("long").as("train_pct"),
        (when(col("f") === 8, col("n8")).when(col("f") === 20, col("n20"))
          .when(col("f") === 40, col("n40")).otherwise(col("n80")))
          .cast("long").as("n_train_tokens"),
        (when(col("f") === 8, col("v8")).when(col("f") === 20, col("v20"))
          .when(col("f") === 40, col("v40")).otherwise(col("v80")))
          .cast("long").as("vocab_size"),
        when(col("f") === 8, col("ms8")).when(col("f") === 20, col("ms20"))
          .when(col("f") === 40, col("ms40")).otherwise(col("ms80"))
          .as("heldout_surprisal"),
        col("n_held"), slope.as("loss_slope"))
      .withColumn("more_data_helps", col("loss_slope") < 0)
  }

  val qScalingCurveSql: String = {
    val fracs = Seq(8, 20, 40, 80)
    val cCols = fracs.map(f =>
      s"CAST(sum(CASE WHEN b < $f THEN 1 ELSE 0 END) AS BIGINT) AS c$f")
      .mkString(", ")
    val tCols = fracs.flatMap(f => Seq(
      s"CAST(sum(c$f) AS BIGINT) AS n$f",
      s"CAST(sum(CASE WHEN minb < $f THEN 1 ELSE 0 END) AS BIGINT) AS v$f"))
      .mkString(", ")
    val msCols = fracs.map(f =>
      s"round(avg(-ln(CAST(coalesce(c$f, 0) + 1 AS DOUBLE) / (n$f + v$f))), 6) AS ms$f")
      .mkString(", ")
    def x(f: Int) = s"round(ln(CAST(n$f AS DOUBLE)), 10)"
    val xbar = s"((${x(8)} + ${x(20)} + ${x(40)} + ${x(80)}) / 4)"
    val ybar = "((ms8 + ms20 + ms40 + ms80) / 4)"
    val num = fracs.map(f => s"((${x(f)}) - $xbar) * (ms$f - $ybar)")
      .mkString(" + ")
    val den = fracs.map(f => s"((${x(f)}) - $xbar) * ((${x(f)}) - $xbar)")
      .mkString(" + ")
    raw"""WITH t AS (SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
         |      AS b,
         |    $duckToks AS toks FROM documents),
         |toks AS (SELECT doc_id, b, unnest(toks) AS tok FROM t),
         |vocab AS (SELECT tok, $cCols, min(b) AS minb
         |  FROM toks WHERE b < 80 GROUP BY tok),
         |totals AS (SELECT $tCols FROM vocab),
         |held AS (SELECT h.tok, v.c8, v.c20, v.c40, v.c80
         |  FROM toks h LEFT JOIN vocab v USING (tok) WHERE h.b >= 90),
         |scored AS (SELECT CAST(count(*) AS BIGINT) AS n_held, $msCols
         |  FROM held, totals),
         |sl AS (SELECT round(($num) / ($den), 6) AS loss_slope
         |  FROM scored, totals),
         |fr(f) AS (VALUES (8), (20), (40), (80))
         |SELECT CAST(f * 100 / 80 AS BIGINT) AS train_pct,
         |  CASE f WHEN 8 THEN n8 WHEN 20 THEN n20 WHEN 40 THEN n40
         |    ELSE n80 END AS n_train_tokens,
         |  CASE f WHEN 8 THEN v8 WHEN 20 THEN v20 WHEN 40 THEN v40
         |    ELSE v80 END AS vocab_size,
         |  CASE f WHEN 8 THEN ms8 WHEN 20 THEN ms20 WHEN 40 THEN ms40
         |    ELSE ms80 END AS heldout_surprisal,
         |  n_held, loss_slope, (loss_slope < 0) AS more_data_helps
         |FROM fr, scored, totals, sl""".stripMargin
  }

  // ---------------------------------------------------------------- K36
  /** Source-mixture entropy — the diversity number a data-mixture
    * review opens with: Shannon entropy of the per-source TOKEN-mass
    * distribution and its exponential, the "effective source count"
    * (20 sources contributing 3.2 effective sources is a very
    * different corpus than 20 contributing 18). ENGINE-EXACT: each
    * source's entropy term p·ln(1/p) µ-quantizes as
    * halfUp(10⁶·m·(lnT_µ − lnm_µ)/T) — two E33 µ-lns of exact
    * integers, one decimal product, one half-up DIV — so the entropy
    * numerator is an exact integer SUM (order-free; a 20-row double
    * sum would be last-ulp order-dependent), H = Σ/10¹², and
    * exp(H) is one fixed-order double. Per-source breakdown rows
    * (mass, share ppm, entropy term) with the global H / effective-
    * source columns broadcast on each (K31 discipline).
    */
  def qMixtureEntropy(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val mass = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(tokenCount(col("text")).cast("long")).cast("long").as("m"))
    val tot = mass.agg(sum(col("m")).cast("long").as("t"))
    val terms = mass.crossJoin(broadcast(tot))
      .withColumn("lnt_mu", round(log(col("t").cast("double")) * 1e6)
        .cast("long"))
      .withColumn("lnm_mu", round(log(col("m").cast("double")) * 1e6)
        .cast("long"))
      .withColumn("h_term", expr(
        """(2 * CAST(m AS DECIMAL(38,0)) * (lnt_mu - lnm_mu) * 1000000 + t)
          | DIV (2 * CAST(t AS DECIMAL(38,0)))"""
          .stripMargin.replace("\n", " ")).cast("long"))
      .withColumn("share_ppm", expr(
        "CAST((2 * CAST(m AS DECIMAL(38,0)) * 1000000 + t)" +
          " DIV (2 * CAST(t AS DECIMAL(38,0))) AS BIGINT)"))
    val h = terms.agg(sum(col("h_term").cast(d38)).cast("long").as("hsum"))
      .select(round(col("hsum").cast("double") / 1e12, 6).as("entropy"),
        round(exp(col("hsum").cast("double") / 1e12), 4)
          .as("effective_sources"))
    terms.select(col("source"), col("m").as("tok_mass"),
        col("share_ppm"), col("h_term"))
      .crossJoin(broadcast(h))
  }

  val qMixtureEntropySql: String = {
    val toksE = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH mass AS (SELECT source,
       |    CAST(sum(len($toksE)) AS BIGINT) AS m FROM documents
       |  GROUP BY source),
       |tot AS (SELECT CAST(sum(m) AS BIGINT) AS t FROM mass),
       |terms AS (SELECT source, m,
       |    CAST((2 * CAST(m AS HUGEINT)
       |        * (CAST(round(ln(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
       |          - CAST(round(ln(CAST(m AS DOUBLE)) * 1000000) AS BIGINT))
       |        * 1000000 + t)
       |      // (2 * CAST(t AS HUGEINT)) AS BIGINT) AS h_term,
       |    CAST((2 * CAST(m AS HUGEINT) * 1000000 + t)
       |      // (2 * CAST(t AS HUGEINT)) AS BIGINT) AS share_ppm
       |  FROM mass, tot),
       |h AS (SELECT round(CAST(sum(h_term) AS DOUBLE) / 1e12, 6)
       |      AS entropy,
       |    round(exp(CAST(sum(h_term) AS DOUBLE) / 1e12), 4)
       |      AS effective_sources
       |  FROM terms)
       |SELECT source, m AS tok_mass, share_ppm, h_term,
       |  entropy, effective_sources
       |FROM terms, h""".stripMargin
  }

  // ---------------------------------------------------------------- K35
  /** Context-window fit audit — the question every context-length
    * decision starts from: at window w ∈ {512, 2048, 8192} tokens,
    * how many documents fit whole, how many truncate, and what share
    * of the token mass a truncate-don't-chunk policy would discard
    * (K1 prices the CHUNKING policy; this prices TRUNCATION, the
    * policy SFT sets actually ship with). One token-count scan, a
    * 3-literal window explode on arithmetic rows, one aggregate per
    * window — exact integers to three half-up ppm ratios. 3 rows.
    */
  def qContextLen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("nt"))
    def ppm(num: String, den: String): org.apache.spark.sql.Column =
      expr(s"CAST((2 * CAST($num AS DECIMAL(38,0)) * 1000000 + $den)" +
        s" DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT)")
    toks.crossJoin(broadcast(Seq(512L, 2048L, 8192L).toDF("window")))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nt") <= col("window"), 1L).otherwise(0L))
          .cast("long").as("n_fit"),
        sum(col("nt").cast(d38)).as("tok_total"),
        sum(when(col("nt") > col("window"), col("nt") - col("window"))
          .otherwise(0L).cast(d38)).as("tok_lost"))
      .select(col("window"), col("n_docs"), col("n_fit"),
        (col("n_docs") - col("n_fit")).as("n_trunc"),
        col("tok_total").cast("long").as("tok_total"),
        col("tok_lost").cast("long").as("tok_lost"),
        ppm("n_fit", "n_docs").as("fit_ppm"),
        ppm("tok_lost", "tok_total").as("loss_ppm"))
  }

  val qContextLenSql: String = {
    val toksE = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH toks AS (SELECT doc_id, CAST(len($toksE) AS BIGINT) AS nt
       |  FROM documents),
       |win AS (SELECT unnest([512, 2048, 8192]) AS wdw),
       |agg AS (SELECT wdw AS "window", CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN nt <= wdw THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_fit,
       |    sum(CAST(nt AS HUGEINT)) AS tok_total,
       |    sum(CASE WHEN nt > wdw THEN CAST(nt - wdw AS HUGEINT)
       |      ELSE 0 END) AS tok_lost
       |  FROM toks, win GROUP BY 1)
       |SELECT "window", n_docs, n_fit, n_docs - n_fit AS n_trunc,
       |  CAST(tok_total AS BIGINT) AS tok_total,
       |  CAST(tok_lost AS BIGINT) AS tok_lost,
       |  CAST((2 * CAST(n_fit AS HUGEINT) * 1000000 + n_docs)
       |    // (2 * CAST(n_docs AS HUGEINT)) AS BIGINT) AS fit_ppm,
       |  CAST((2 * tok_lost * 1000000 + tok_total)
       |    // (2 * tok_total) AS BIGINT) AS loss_ppm
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- K34
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — the
    * domain-targeting selector a mixture rebalance actually runs:
    * score every document by how much more likely its hashed-unigram
    * features are under a TARGET domain than under the raw corpus,
    * log w(doc) = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)].
    * Target = the largest source (count DESC, source ASC — the
    * reference-domain convention, documented); features = md5-hashed
    * unigram buckets mod 64 (the K16 engine-portable md5 device);
    * add-1 smoothing over the observed bucket grid. ENGINE-EXACT:
    * each bucket's log-ratio is a DIFFERENCE of two µ-quantized lns
    * of exact integer ratios (the E33 device, the FeatureOps
    * difference discipline), so per-doc log-weights are exact LONG
    * sums; per-source means publish via the sign-split half-up DIV.
    * Shapes: one token explode, two 64-row bucket aggregates
    * (broadcast back), one doc-keyed sum, one source aggregate.
    * Output per source: docs, mean µ-log-weight, target-like doc
    * share — the table a DSIR resampler prices its mixture from.
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val tokStream = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        expr("conv(substring(md5(tok), 1, 15), 16, 10) % 64").cast("long"))
    val target = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
      .orderBy(col("nd").desc, col("source").asc).limit(1)
      .select(col("source").as("tgt"))
    val withTgt = tokStream.crossJoin(broadcast(target))
    val buckets = withTgt.groupBy(col("bucket"))
      .agg(sum(when(col("source") === col("tgt"), 1L).otherwise(0L))
          .cast("long").as("ct"),
        count(lit(1)).cast("long").as("cr"))
    val tots = buckets.agg(sum(col("ct") + 1).cast("long").as("st"),
      sum(col("cr") + 1).cast("long").as("sr"))
    val lr = buckets.crossJoin(broadcast(tots))
      .select(col("bucket"),
        (round(log((col("ct") + 1).cast("double") / col("st")) * 1e6)
          .cast("long") -
          round(log((col("cr") + 1).cast("double") / col("sr")) * 1e6)
            .cast("long")).as("lr_mu"))
    val perDoc = tokStream.join(broadcast(lr), Seq("bucket"))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("lr_mu")).cast("long").as("logw"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("logw").cast(d38)).as("sw"),
        sum(when(col("logw") > 0, 1L).otherwise(0L)).cast("long")
          .as("pos_docs"))
      .select(col("source"), col("n_docs"),
        expr(
          """CASE WHEN sw >= 0
            | THEN (2 * sw + n_docs) DIV (2 * CAST(n_docs AS DECIMAL(38,0)))
            | ELSE -((2 * (-sw) + n_docs)
            |   DIV (2 * CAST(n_docs AS DECIMAL(38,0)))) END"""
            .stripMargin.replace("\n", " ")).cast("long")
          .as("mean_logw_mu"),
        col("pos_docs"),
        expr("CAST((2 * CAST(pos_docs AS DECIMAL(38,0)) * 1000000 + n_docs)" +
          " DIV (2 * CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)")
          .as("target_like_ppm"))
  }

  val qDsirWeightsSql: String = {
    val toksE = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH ts AS (SELECT source, doc_id,
       |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
       |  FROM (SELECT source, doc_id, unnest($toksE) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0),
       |tgt AS (SELECT source AS tgt FROM documents GROUP BY source
       |  ORDER BY count(*) DESC, source ASC LIMIT 1),
       |buckets AS (SELECT bucket,
       |    CAST(sum(CASE WHEN source = (SELECT tgt FROM tgt)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(count(*) AS BIGINT) AS cr
       |  FROM ts GROUP BY bucket),
       |tots AS (SELECT CAST(sum(ct + 1) AS BIGINT) AS st,
       |    CAST(sum(cr + 1) AS BIGINT) AS sr FROM buckets),
       |lr AS (SELECT bucket,
       |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / st) * 1000000) AS BIGINT)
       |    - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / sr) * 1000000) AS BIGINT)
       |      AS lr_mu
       |  FROM buckets, tots),
       |perdoc AS (SELECT source, doc_id,
       |    CAST(sum(lr_mu) AS BIGINT) AS logw
       |  FROM ts JOIN lr USING (bucket) GROUP BY source, doc_id),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    sum(CAST(logw AS HUGEINT)) AS sw,
       |    CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS pos_docs
       |  FROM perdoc GROUP BY source)
       |SELECT source, n_docs,
       |  CAST(CASE WHEN sw >= 0
       |    THEN (2 * sw + n_docs) // (2 * CAST(n_docs AS HUGEINT))
       |    ELSE -((2 * (-sw) + n_docs) // (2 * CAST(n_docs AS HUGEINT)))
       |    END AS BIGINT) AS mean_logw_mu,
       |  pos_docs,
       |  CAST((2 * CAST(pos_docs AS HUGEINT) * 1000000 + n_docs)
       |    // (2 * CAST(n_docs AS HUGEINT)) AS BIGINT) AS target_like_ppm
       |FROM agg""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsir_weights" -> (qDsirWeights _),
    "q_context_len" -> (qContextLen _),
    "q_ngram_novelty" -> (qNgramNovelty _),
    "q_span_corruption_plan" -> (qSpanCorruptionPlan _),
    "q_length_lognormal" -> (qLengthLognormal _),
    "q_mixture_entropy" -> (qMixtureEntropy _),
    "q_scaling_curve" -> (qScalingCurve _),
    "q_stupid_backoff" -> (qStupidBackoff _),
    "q_js_divergence" -> (qJsDivergence _),
    "q_quality_tradeoff" -> (qQualityTradeoff _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_pack_efficiency" -> (qPackEfficiency _),
    "q_interleave_schedule" -> (qInterleaveSchedule _),
    "q_gini_concentration" -> (qGiniConcentration _),
    "q_psi_drift" -> (qPsiDrift _),
    "q_heldout_surprisal" -> (qHeldoutSurprisal _),
    "q_packing_efficiency" -> (qPackingEfficiency _),
    "q_padding_waste" -> (qPaddingWaste _),
    "q_shard_manifest" -> (qShardManifest _),
    "q_pipeline_e2e" -> (qPipelineE2e _),
    "q_retention" -> (qRetention _),
    "q_quality_deciles" -> (qQualityDeciles _),
    "q_zipf_fit" -> (qZipfFit _),
    "q_heaps_fit" -> (qHeapsFit _),
    "q_quality_drift" -> (qQualityDrift _),
    "q_lang_source_independence" -> (qLangSourceIndependence _),
    "q_repetition" -> (qRepetition _),
    "q_unigram_surprisal" -> (qUnigramSurprisal _),
    "q_bigram_surprisal" -> (qBigramSurprisal _),
    "q_curriculum_plan" -> (qCurriculumPlan _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_pmi_collocations" -> (qPmiCollocations _),
    "q_ppmi_embed" -> (qPpmiEmbed _),
    "q_chunk_plan" -> (qChunkPlan _),
    "q_seq_packing" -> (qSeqPacking _),
    "q_hash_split" -> (qHashSplit _),
    "q_source_cap" -> (qSourceCap _),
    "q_mixture_weights" -> (qMixtureWeights _),
    "q_temperature_mixture" -> (qTemperatureMixture _),
    "q_epoch_schedule" -> (qEpochSchedule _),
    "q_resample" -> (qResample _),
    "q_corpus_health" -> (qCorpusHealth _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_anomaly" -> (qAnomaly _))

  def oracle: Map[String, String] = Map(
    "q_dsir_weights" -> qDsirWeightsSql,
    "q_context_len" -> qContextLenSql,
    "q_ngram_novelty" -> qNgramNoveltySql,
    "q_span_corruption_plan" -> qSpanCorruptionPlanSql,
    "q_length_lognormal" -> qLengthLognormalSql,
    "q_mixture_entropy" -> qMixtureEntropySql,
    "q_scaling_curve" -> qScalingCurveSql,
    "q_stupid_backoff" -> qStupidBackoffSql,
    "q_js_divergence" -> qJsDivergenceSql,
    "q_quality_tradeoff" -> qQualityTradeoffSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_pack_efficiency" -> qPackEfficiencySql,
    "q_interleave_schedule" -> qInterleaveScheduleSql,
    "q_gini_concentration" -> qGiniConcentrationSql,
    "q_psi_drift" -> qPsiDriftSql,
    "q_heldout_surprisal" -> qHeldoutSurprisalSql,
    "q_packing_efficiency" -> qPackingEfficiencySql,
    "q_padding_waste" -> qPaddingWasteSql,
    "q_shard_manifest" -> qShardManifestSql,
    "q_pipeline_e2e" -> qPipelineE2eSql,
    "q_retention" -> qRetentionSql,
    "q_quality_deciles" -> qQualityDecilesSql,
    "q_zipf_fit" -> qZipfFitSql,
    "q_heaps_fit" -> qHeapsFitSql,
    "q_quality_drift" -> qQualityDriftSql,
    "q_lang_source_independence" -> qLangSourceIndependenceSql,
    "q_repetition" -> qRepetitionSql,
    "q_unigram_surprisal" -> qUnigramSurprisalSql,
    "q_bigram_surprisal" -> qBigramSurprisalSql,
    "q_curriculum_plan" -> qCurriculumPlanSql,
    "q_vocab_coverage" -> qVocabCoverageSql,
    "q_pmi_collocations" -> qPmiCollocationsSql,
    "q_ppmi_embed" -> qPpmiEmbedSql,
    "q_chunk_plan" -> qChunkPlanSql,
    "q_seq_packing" -> qSeqPackingSql,
    "q_hash_split" -> qHashSplitSql,
    "q_source_cap" -> qSourceCapSql,
    "q_mixture_weights" -> qMixtureWeightsSql,
    "q_temperature_mixture" -> qTemperatureMixtureSql,
    "q_epoch_schedule" -> qEpochScheduleSql,
    "q_resample" -> qResampleSql,
    "q_corpus_health" -> qCorpusHealthSql,
    "q_dataset_card" -> qDatasetCardSql,
    "q_anomaly" -> qAnomalySql)
}
