package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language ID,
  * document fingerprinting. All codegen'd built-ins — the hot path stays in
  * whole-stage codegen with no UDFs, so throughput scales with scan speed. */
object TextAnalysis {

  /** Per-document token statistics. Tokenization is SINGLE-SPACE split —
    * deliberately, not `\s+`: the one-character kernel behaves identically
    * in every engine (Java regex vs RE2 disagree at the unicode-whitespace
    * edges), which is what keeps these operators oracle-hash-exact.
    * Corpora with tabs/newlines/runs of spaces should normalize upstream
    * (`regexp_replace(text, "\\s+", " ")`) — same contract as
    * [[Dedup.shingles]]. Emits token count, distinct-token count, summed
    * token chars, longest token, all BIGINT for type stability. */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), split(lower(col(textCol)), " ").as("w"))
      .select(
        col(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        expr("aggregate(w, 0L, (acc, x) -> acc + length(x))").as("total_chars"),
        expr("array_max(transform(w, x -> cast(length(x) as bigint)))").as("max_token_len"))

  /** BPE-ish subword token count: whitespace words further split by a
    * greedy length-4 chunking — a deterministic stand-in for a real BPE
    * vocab (not shippable in this container), with the same plan shape:
    * per-row expression, no shuffle. */
  def subwordCount(df: DataFrame, textCol: String, idCol: String,
                   chunk: Int = 4): DataFrame =
    df.select(col(idCol),
      expr(s"""aggregate(split(lower($textCol), ' '), 0L,
              |  (acc, x) -> acc + cast(ceil(length(x) / $chunk.0) as bigint))"""
        .stripMargin).as("n_subwords"))

  /** Quality score components: repetition ratio (1 − distinct/total) and
    * mean token length — cheap corpus-filtering heuristics as exact
    * micro-unit integers. (r11 review: the doc once promised a
    * short-token fraction the select never emitted; compose one from
    * [[tokenStats]] if needed.) */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokenStats(df, textCol, idCol).select(
      col(idCol),
      // micro-unit ratios via integer `div`: exact, engine-stable (double
      // division + cast could round across an integer boundary)
      expr("(n_tokens - n_distinct) * 1000000 div n_tokens").as("repetition_micro"),
      expr("total_chars * 1000000 div n_tokens").as("mean_token_len_micro"))

  /** PII redaction: emails, IPv4 addresses and phone numbers replaced with
    * typed placeholders, plus per-document match counts (the audit trail a
    * curation pipeline logs). Patterns stay in the Java-regex/RE2 common
    * subset (character classes, bounded repetition — no lookaround), so
    * behavior is identical across engines and the oracle can replicate
    * redaction byte-for-byte. Order matters and is fixed: emails first
    * (their domains must not half-match as hosts), then IPs, then phones.
    * Pure per-row codegen'd `regexp_replace` — one pass, zero shuffle. */
  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[ops] val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // each audit count runs over the text its replacement pass actually
    // saw: a digit-run nested inside an already-redacted email must not
    // count as an unredacted phone (the counts reconcile against
    // placeholders in the redacted output)
    val afterEmail = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, IpRe, "<IP>")
    df.select(
      col(idCol),
      regexp_replace(afterIp, PhoneRe, "<PHONE>").as("redacted"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(IpRe)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(PhoneRe)).cast("long").as("n_phones"))
  }

  /** N-gram-profile language ID: score each candidate language by marker
    * token hits; predict the argmax. A document whose best score is below
    * `minScore` predicts NULL — by default (minScore = 1) text matching no
    * profile honestly reports "no answer" instead of an arbitrary language
    * (r11 verdict #7). Pass `minScore = 0` to force a prediction for every
    * row; EQUAL scores (all-zero included at minScore = 0) then resolve to
    * the lexicographically LAST language — the struct-max tiebreak, stated
    * here because it surprises. The profiles are deliberately tiny — the
    * operator's value is its plan shape (one pass, no shuffle, no UDF),
    * not the linguistics. */
  def languageId(df: DataFrame, textCol: String, idCol: String,
                 profiles: Map[String, Seq[String]] = defaultProfiles,
                 minScore: Int = 1): DataFrame = {
    require(profiles.nonEmpty, "languageId needs at least one profile")
    val w = split(lower(col(textCol)), " ")
    val scores: Seq[(String, Column)] = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      lang -> size(expr_filter(w, arr))
    }
    val best = scores.map { case (lang, s) => struct(s.as("score"), lit(lang).as("lang")) }
    // greatest() demands 2+ args — a single-profile call is a plain projection
    val winner = if (best.size == 1) best.head else greatest(best: _*)
    if (minScore <= 0)
      df.select(col(idCol), winner.getField("lang").as("pred_lang")) // scores are non-negative
    else {
      // materialize the winner struct ONCE before reading both fields: the
      // higher-order filter() lambdas inside it are outside codegen CSE, so
      // referencing `winner` twice in one projection re-scans the token
      // array per language a second time (the r12 q33 1.7× regression).
      // CollapseProject keeps the stages apart (non-cheap alias, used 2×).
      df.select(col(idCol), winner.as("_w"))
        .select(col(idCol),
          when(col("_w").getField("score") >= minScore,
            col("_w").getField("lang")).as("pred_lang"))
    }
  }

  private def expr_filter(w: Column, markers: Column): Column =
    filter(w, t => array_contains(markers, t))

  private val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  /** Polynomial rolling-hash fingerprint of the whole document (base 31,
    * mod 1e9+7 so the fold never overflows under ANSI arithmetic) — a
    * Rabin-Karp-style content fingerprint computed as one codegen'd fold
    * over the characters. */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      expr(s"aggregate(split($textCol, ''), 0L, (acc, c) -> pmod(acc * 31L + ascii(c), 1000000007L))")
        .as("fingerprint"))
}
