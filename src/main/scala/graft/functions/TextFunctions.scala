package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks (SURVEY.md §2 block B).
  *
  * Every function here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — fully whole-stage-codegen'd,
  * no UDFs — and has an exact DuckDB-SQL mirror (documented per
  * function) so operators built on top stay oracle-checkable.
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, collapse whitespace,
    * trim. Mirror: `regexp_replace(lower(trim(x)), '\s+', ' ', 'g')`.
    */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Scripts written without word spaces — each codepoint becomes its
    * own token (the standard unigram segmentation fallback when no
    * dictionary segmenter ships with the engine). Java regex script
    * classes on the Spark side, RE2 classes in the DuckDB mirror;
    * verified equivalent codepoint-for-codepoint in GraftSpec.
    */
  private val cjkClassJava = "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}"
  private val cjkClassSql = raw"\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}"

  /** Insert word boundaries around space-less-script codepoints.
    * Mirror: [[segmentSql]]. */
  def segmentText(c: Column): Column =
    regexp_replace(c, s"([$cjkClassJava])", " $1 ")

  /** DuckDB mirror of [[segmentText]]. */
  def segmentSql(col: String): String =
    raw"regexp_replace($col, '([$cjkClassSql])', ' \1 ', 'g')"

  /** Unicode-aware tokens of normalized text: CJK codepoints are
    * segmented individually, then whitespace splits. ASCII-only text
    * tokenizes exactly as a plain whitespace split. Mirror:
    * [[duckToksSql]].
    */
  def tokens(c: Column): Column = split(normText(segmentText(c)), " ")

  /** DuckDB mirror of `normText(segmentText(col))` — the normalized,
    * CJK-segmented string [[tokens]] splits.
    */
  def normSegSql(col: String): String =
    raw"regexp_replace(lower(trim(${segmentSql(col)})), '\s+', ' ', 'g')"

  /** DuckDB mirror of [[tokens]] over column `col`. */
  def duckToksSql(col: String): String =
    s"regexp_split_to_array(${normSegSql(col)}, ' ')"

  /** Token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Number of tokens of `toks` contained in the fixed vocabulary
    * (with multiplicity). Mirror: `len(list_filter(toks, t ->
    * list_contains([...], t)))`. Runs as the codegen [[VocabHits]]
    * kernel (r18): the previous `size(filter(...))` HOF evaluated an
    * interpreted lambda per token, linear-scanning the vocabulary
    * literal — identical values, one hash probe per token instead.
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    GraftExpressions.vocab_hits(toks, vocab)

  /** Distinct character k-shingles of normalized text (k=5 default).
    * Short texts yield their full (padded-by-truncation) prefix as the
    * single shingle. Mirror: unnest(generate_series)+substr+DISTINCT.
    */
  def shingles(c: Column, k: Int = 5): Column = {
    val n = normText(c)
    array_distinct(transform(
      sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
      i => n.substr(i, lit(k))))
  }

  /** md5-hex content fingerprint of normalized text — identical in
    * Spark and DuckDB by construction.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Deterministic 32-bit-range shingle hash shared with the oracle:
    * polynomial over the first 5 character codes, mod the prime
    * 4294967291. Engine-portable (only ascii/substring/arithmetic).
    */
  def shingleHash(s: Column): Column = {
    val p = lit(4294967291L)
    val h = ascii(substring(s, 1, 1)).cast("long") +
      ascii(substring(s, 2, 1)).cast("long") * 31L +
      ascii(substring(s, 3, 1)).cast("long") * 961L +
      ascii(substring(s, 4, 1)).cast("long") * 29791L +
      ascii(substring(s, 5, 1)).cast("long") * 923521L
    h % p
  }

  /** DuckDB mirror of [[shingleHash]] for oracle construction. */
  def shingleHashSql(col: String): String =
    s"(ascii(substr($col,1,1)) + ascii(substr($col,2,1))*31 + ascii(substr($col,3,1))*961 + " +
      s"ascii(substr($col,4,1))*29791 + ascii(substr($col,5,1))*923521) % 4294967291"
}
