package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, SQL-portable scalar functions shared by the engine and
  * its DuckDB oracle.
  *
  * The reference encodes each word to a BPE token id via JTokkit
  * `cl100k_base`, keeping only the FIRST token id
  * (reference `MapRedWord2Vec.scala:69-70,170`) — a lossy label, not a
  * reversible encoding (SURVEY.md §4.3). Offline (no JTokkit) we replace it
  * with a deterministic polynomial char-code hash that both Spark and DuckDB
  * can compute, so the flagship output stays oracle-checked end to end
  * (SURVEY.md §7.1).
  *
  * Everything here is built from Spark's higher-order array functions
  * (`aggregate`, `transform`, `filter`) — codegen'd built-ins, no Scala
  * UDFs — so the expressions stay inside whole-stage codegen and scale
  * linearly with input bytes; there is no per-row JVM boxing.
  */
object Portable {
  /** Modulus keeps the fold inside Long range: acc < P, so
    * acc*31 + char < 3.2e10 << Long.MaxValue. Same literal used in the
    * DuckDB oracle SQL. */
  val P: Long = 1000000007L

  /** Characters of a string column as array<string>, no empties.
    * (Spark `split(s, "")` keeps a trailing "" at limit -1; filter it.) */
  def chars(c: Column): Column =
    filter(split(c, ""), ch => ch =!= lit(""))

  /** word -> Long token id: fold (acc*31 + codepoint) % P over characters.
    * Stands in for the reference's first-BPE-token encode (R6).
    * Dispatches to the native codegen'd expression
    * ([[graft.plans.TokenId]]); [[tokenIdHof]] is the pure-built-ins
    * twin kept as the executable spec. */
  def tokenId(c: Column): Column = graft.plans.TokenId.tokenId(c)

  /** HOF reference implementation of [[tokenId]] (identical values,
    * asserted in tests). */
  def tokenIdHof(c: Column): Column =
    aggregate(chars(c), lit(0L), (acc, ch) => (acc * lit(31L) + ascii(ch)) % lit(P))

  /** Order-sensitive document fingerprint: fold (acc*131 + tokenId(word)) % P
    * over a word array — a rolling polynomial hash over the token stream,
    * so reordered documents fingerprint differently (unlike a set hash). */
  def fingerprint(words: Column): Column =
    aggregate(words, lit(0L), (acc, w) => (acc * lit(131L) + tokenId(w)) % lit(P))

  /** The same tokenizer the reference applies (R4+R5,
    * `MapRedWord2Vec.scala:101-102`): lowercase, split on non-word runs,
    * keep purely alphabetic tokens. */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "\\W+"), w => w.rlike("^[a-z]+$"))

  /** Word n-gram shingles: array of space-joined n-grams of `words`.
    * Docs shorter than n shingle to their full text (slice clamps at the
    * end). slice+array_join keeps the generated code small — an earlier
    * n-way concat_ws(try_element_at…) form compiled to enough Janino
    * source to dominate cold-start time. */
  def shingles(words: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(words) - lit(n - 1), lit(1))),
      i => array_join(slice(words, i, lit(n)), " "))
    array_distinct(grams)
  }
}
