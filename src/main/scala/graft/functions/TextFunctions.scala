package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the text-analysis / dedup operator family
  * (beyond-reference surface, BASELINE.json north star: "LLM-data-pipeline
  * operators ... designed for 100 TB scale").
  *
  * Everything here composes built-in (codegen-friendly) functions and
  * higher-order array functions — no Scala UDFs — so Catalyst can push,
  * prune, and pipeline them. The arithmetic char-hash exists so an
  * independent engine (the DuckDB oracle) can recompute identical values;
  * see `XxMinHash` for the faster non-oracle variant used in benchmarks.
  */
object TextFunctions {

  /** Modulus for the polynomial rolling hash (fits comfortably in int64
    * with *31 + codepoint steps).
    */
  val HashMod = 1000000007L

  /** Whitespace tokens of lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles (space-joined), duplicate-preserving.
    * Guarded: Spark's `sequence(0, -1)` would DESCEND for docs shorter
    * than n, so short docs explicitly yield an empty array (matching
    * SQL `range(...)` which is ascending-only).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Polynomial rolling hash of a string's code points, seeded:
    * acc = (acc * 31 + codepoint) mod 1e9+7. Deterministic and
    * recomputable in ANSI-ish SQL for oracle parity.
    */
  def charHash(s: Column, seed: Column): Column =
    aggregate(
      transform(regexp_extract_all(s, lit("."), lit(0)), c => ascii(c).cast("long")),
      seed.cast("long"),
      (acc, x) => pmod(acc * 31 + x, lit(HashMod)))

  /** JVM-side twin of [[charHash]] for executor-local code paths
    * (image rendering in [[graft.operators.Multimodal]]): identical
    * fold, identical modulus, and the same character stream — regexp
    * `.` skips line terminators, so they are skipped here too.
    */
  def charHashLocal(s: String, seed: Long): Long = {
    var acc = seed % HashMod
    val it = s.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      if (cp != '\n' && cp != '\r' && cp != 0x85 && cp != 0x2028 &&
        cp != 0x2029) {
        acc = (acc * 31 + cp) % HashMod
        if (acc < 0) acc += HashMod
      }
    }
    acc
  }

  /** MinHash signature via the standard one-base-hash + k affine
    * transforms: sig[i] = min over shingles of
    * ((2i+1) * baseHash(s) + 31i + 7) mod P. One char-iteration per
    * shingle instead of k (8× fewer interpreted HOF steps), identical
    * LSH guarantees, still exactly recomputable in oracle SQL.
    */
  def minhashSignature(shingleSet: Column, k: Int): Column = {
    val base = transform(shingleSet, s => charHash(s, lit(1)))
    transform(sequence(lit(1), lit(k)), i =>
      array_min(transform(base, h =>
        pmod((i * 2 + 1) * h + i * 31 + 7, lit(HashMod)))))
  }

  /** 32-bit SimHash over the distinct-token set: bit b is set when the
    * sum of (+1/-1) votes from each token-hash's bit b is positive.
    */
  def simhash32(toks: Column): Column = {
    val hashes = transform(array_distinct(toks), t => charHash(t, lit(7)))
    aggregate(
      transform(sequence(lit(0), lit(31)), b =>
        when(
          aggregate(hashes, lit(0L), (acc, h) => acc + bitAt(h, b) * 2 - 1) > 0,
          shiftPow(b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Bit b of non-negative h, via floor(h / 2^b) % 2 — exact in double
    * arithmetic for h < 2^52, and expressed with explicit floor so the
    * oracle SQL can't diverge on cast-rounding (DuckDB CAST rounds,
    * Spark CAST truncates).
    */
  private def bitAt(h: Column, b: Column): Column =
    pmod(floor(h.cast("double") / pow(lit(2.0), b)).cast("long"), lit(2L))

  /** 2^b as a long column (b < 40); pow is exact for these. */
  private def shiftPow(b: Column): Column = pow(lit(2.0), b).cast("long")

  /** Count of tokens present in a lexicon. */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(lexicon)))

  /** Tiny stopword lexicons for the n-gram language-ID heuristic. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "ser", "se", "no", "los"),
    "fr" -> Seq("le", "les", "et", "un", "une", "pour", "dans", "est", "du", "au"))

  /** Canonical-form fingerprint: md5 of whitespace-normalized lowercase
    * text (document identity for exact dedup).
    */
  def fingerprint(text: Column): Column =
    md5(encode(regexp_replace(trim(lower(text)), "\\s+", " "), "UTF-8"))
}
