"""Text-analysis battery over `documents` (SURVEY.md §2.4, text half).

All four operators are single-pass column expressions on a pruned
(doc_id, text) scan — no shuffle at all except the final ORDER BY
(which only exists for presentation; at scale you'd drop it). No
Python UDFs: tokenization, ratio math, language profiles and
fingerprints are built-in-function trees, so they run inside
whole-stage codegen and scale linearly with input splits.

Determinism: ratios are single double divisions of exact ints cast
to DECIMAL(38,6) with identical op order in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    char_ngram_hashes,
    count_matches,
    norm_text,
    stopword_hits,
    tokens,
)
from ..sources.readers import load_table

D38_6 = "decimal(38,6)"

STOPWORDS_EN = ("the", "a", "and", "of", "to", "is", "in", "for", "on", "it")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
STOPWORDS_FR = ("le", "les", "et", "est", "un", "une", "pour", "dans")
STOPWORDS_ES = ("el", "los", "las", "es", "y", "una", "para", "como")


def _ratio(num: F.Column, den: F.Column) -> F.Column:
    return (num.cast("double") / den.cast("double")).cast(D38_6)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics (token count, char count,
    punct/digit/space ratios, stopword ratio, avg token length)."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks = tokens("text")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    tok_len_sum = F.expr(
        "aggregate(transform(split(trim(text), '\\\\s+'), t -> length(t)), 0, (acc, x) -> acc + x)"
    )
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        _ratio(tok_len_sum, n_tokens).alias("avg_token_len"),
        _ratio(count_matches("text", "[0-9]"), n_chars).alias("digit_ratio"),
        _ratio(count_matches("text", "[.,;:!?]"), n_chars).alias("punct_ratio"),
        _ratio(count_matches("text", " "), n_chars).alias("space_ratio"),
        _ratio(stopword_hits("split(trim(text), '\\\\s+')", STOPWORDS_EN), n_tokens).alias(
            "stopword_ratio"
        ),
    ).orderBy("doc_id")


_SW_EN = ",".join(f"'{w}'" for w in STOPWORDS_EN)

TEXT_STATS_SQL = f"""
WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
     / CAST(len(toks) AS DOUBLE) AS DECIMAL(38,6)) AS avg_token_len,
  CAST(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
     / CAST(length(text) AS DOUBLE) AS DECIMAL(38,6)) AS digit_ratio,
  CAST(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
     / CAST(length(text) AS DOUBLE) AS DECIMAL(38,6)) AS punct_ratio,
  CAST(CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
     / CAST(length(text) AS DOUBLE) AS DECIMAL(38,6)) AS space_ratio,
  CAST(CAST(len(list_filter(toks, t -> t IN ({_SW_EN}))) AS DOUBLE)
     / CAST(len(toks) AS DOUBLE) AS DECIMAL(38,6)) AS stopword_ratio
FROM t
ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate: four integer rule checks averaged
    into a score, keep = score ≥ 0.75 (emitted as BIGINT 0/1)."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    tok_len_sum = F.expr(
        "aggregate(transform(split(trim(text), '\\\\s+'), t -> length(t)), 0, (acc, x) -> acc + x)"
    )
    alpha = n_chars - count_matches("text", "[a-zA-Z]")  # non-alpha count
    rule_tokens = F.when(n_tokens.between(5, 5000), 1).otherwise(0)
    # avg token length in [2,15]: compare via cross-multiplication to
    # stay in exact integer math (no float boundary)
    rule_avg_len = F.when(
        (tok_len_sum >= 2 * n_tokens) & (tok_len_sum <= 15 * n_tokens), 1
    ).otherwise(0)
    # non-alpha (excluding single spaces between tokens) below 40%
    rule_alpha = F.when(10 * (alpha - (n_tokens - 1)) <= 4 * n_chars, 1).otherwise(0)
    rule_len = F.when(n_chars.between(20, 100000), 1).otherwise(0)
    score_num = rule_tokens + rule_avg_len + rule_alpha + rule_len
    return d.select(
        "doc_id",
        (score_num.cast("double") / F.lit(4).cast("double")).cast(D38_6).alias("quality_score"),
        F.when(score_num >= 3, 1).otherwise(0).cast("bigint").alias("keep"),
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 5 AND 5000 THEN 1 ELSE 0 END
    + CASE WHEN list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x)))
                BETWEEN 2 * len(regexp_split_to_array(trim(text), '\\s+'))
                    AND 15 * len(regexp_split_to_array(trim(text), '\\s+')) THEN 1 ELSE 0 END
    + CASE WHEN 10 * (length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
                      - (len(regexp_split_to_array(trim(text), '\\s+')) - 1))
                <= 4 * length(text) THEN 1 ELSE 0 END
    + CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS score_num
  FROM documents)
SELECT doc_id,
  CAST(CAST(score_num AS DOUBLE) / CAST(4 AS DOUBLE) AS DECIMAL(38,6)) AS quality_score,
  CAST(CASE WHEN score_num >= 3 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM t
ORDER BY doc_id
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language guess (en/de/fr/es/unknown) with a
    fixed priority tie-break — a deterministic n-gram-heuristic
    language ID that is pure column arithmetic."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks_sql = "split(trim(text), '\\\\s+')"
    c_en = stopword_hits(toks_sql, STOPWORDS_EN)
    c_de = stopword_hits(toks_sql, STOPWORDS_DE)
    c_fr = stopword_hits(toks_sql, STOPWORDS_FR)
    c_es = stopword_hits(toks_sql, STOPWORDS_ES)
    d = d.select(
        "doc_id",
        c_en.alias("c_en"),
        c_de.alias("c_de"),
        c_fr.alias("c_fr"),
        c_es.alias("c_es"),
    )
    lang = (
        F.when((F.col("c_en") >= F.greatest("c_de", "c_fr", "c_es")) & (F.col("c_en") > 0), "en")
        .when((F.col("c_de") >= F.greatest("c_fr", "c_es")) & (F.col("c_de") > 0), "de")
        .when((F.col("c_fr") >= F.col("c_es")) & (F.col("c_fr") > 0), "fr")
        .when(F.col("c_es") > 0, "es")
        .otherwise("unknown")
    )
    return d.select(
        "doc_id",
        lang.alias("lang_guess"),
        (F.col("c_en") + F.col("c_de") + F.col("c_fr") + F.col("c_es"))
        .cast("bigint")
        .alias("n_profile_hits"),
    ).orderBy("doc_id")


def _sw_sql(words: tuple[str, ...]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t IN ({lst})))"


TEXT_LANGID_SQL = f"""
WITH c AS (
  SELECT doc_id,
    {_sw_sql(STOPWORDS_EN)} AS c_en,
    {_sw_sql(STOPWORDS_DE)} AS c_de,
    {_sw_sql(STOPWORDS_FR)} AS c_fr,
    {_sw_sql(STOPWORDS_ES)} AS c_es
  FROM documents)
SELECT doc_id,
  CASE WHEN c_en >= greatest(c_de, c_fr, c_es) AND c_en > 0 THEN 'en'
       WHEN c_de >= greatest(c_fr, c_es) AND c_de > 0 THEN 'de'
       WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
       WHEN c_es > 0 THEN 'es'
       ELSE 'unknown' END AS lang_guess,
  CAST(c_en + c_de + c_fr + c_es AS BIGINT) AS n_profile_hits
FROM c
ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-4 sketch fingerprint: md5 over char-8-grams of the
    normalized text (capped at 1000 chars, sampled every 4th
    position), keep the 4 smallest distinct hashes — an
    order-invariant document fingerprint (the set-sketch form of a
    rolling-hash/winnowing fingerprint)."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    d = d.withColumn("nt", norm_text("text"))
    fp = F.concat_ws(
        "", F.slice(F.array_sort(F.array_distinct(char_ngram_hashes("nt"))), 1, 4)
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = """
WITH t AS (SELECT doc_id,
             substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 1000) AS nt
           FROM documents)
SELECT doc_id,
  array_to_string(
    list_sort(list_distinct(
      list_transform(range(1, greatest(length(nt) - 7, 1) + 1, 4),
                     i -> md5(substring(nt, i, 8)))))[1:4], '') AS fingerprint
FROM t
ORDER BY doc_id
"""


# ---------------------------------------------------- PII scrubbing

# patterns chosen to parse and match identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://\S+"


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass over the corpus: per-doc email/URL match
    counts plus the md5 of the scrubbed text (emails → <EMAIL>,
    URLs → <URL>) — the redaction sweep a training pipeline runs
    before tokenization, as pure JVM column expressions (one
    map-side pass, no shuffle until the final sort)."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    # coalesce: F.size yields -1/NULL for NULL text where DuckDB's
    # len() yields NULL — a parity break if documents.text ever
    # ships nullable (ADVICE r5); both engines count NULL as 0
    def _n(col: str, pat: str):
        return F.coalesce(
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))), F.lit(0)
        ).cast("bigint")

    return d.select(
        "doc_id",
        _n("text", EMAIL_RE).alias("n_emails"),
        _n("text", URL_RE).alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).orderBy("doc_id")


PII_SCRUB_SQL = f"""
SELECT doc_id,
       COALESCE(len(regexp_extract_all(text, '{EMAIL_RE}')), 0) AS n_emails,
       COALESCE(len(regexp_extract_all(text, 'https?://\\S+')), 0) AS n_urls,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          'https?://\\S+', '<URL>', 'g')) AS scrubbed_md5
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------------ repetition filter

REP_N = 5  # word n-gram size for the repetition signal


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter: the fraction of DUPLICATED
    word 5-grams per document — the standard signal LLM pipelines
    use to drop boilerplate, keyword-stuffed spam and degenerate
    generations (high ratio ⇒ the text keeps repeating itself).

    Entirely MAP-SIDE: total 5-grams is arithmetic on the token
    count, distinct 5-grams is ``size(array_distinct(transform))``
    per row — zero shuffle before the presentation sort, linear at
    any corpus size."""
    from ..functions.text import word_ngrams

    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    n_tok = F.size(toks).cast("bigint")
    total = F.greatest(n_tok - F.lit(REP_N - 1), F.lit(0).cast("bigint"))
    dd = d.select("doc_id", n_tok.alias("n_tokens"), total.alias("n_grams"), toks.alias("w"))
    distinct = F.when(
        F.col("n_grams") > 0, F.size(word_ngrams("w", REP_N)).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        dd.select(
            "doc_id",
            "n_tokens",
            "n_grams",
            (F.col("n_grams") - distinct).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            "n_dup_grams",
            F.when(F.col("n_grams") > 0, _ratio(F.col("n_dup_grams"), F.col("n_grams")))
            .otherwise(F.lit(0).cast(D38_6))
            .alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents),
g AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         greatest(len(w) - {REP_N - 1}, 0) AS n_grams,
         CASE WHEN len(w) >= {REP_N}
              THEN len(list_distinct(list_transform(
                     range(1, len(w) - {REP_N - 1} + 1),
                     i -> array_to_string(w[i:i+{REP_N - 1}], ' '))))
              ELSE 0 END AS n_distinct
  FROM toks)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_grams - n_distinct AS BIGINT) AS n_dup_grams,
       CASE WHEN n_grams > 0
            THEN CAST(CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS DECIMAL(38,6))
            ELSE CAST(0 AS DECIMAL(38,6)) END AS rep_ratio
FROM g
ORDER BY doc_id
"""


# ------------------------------------------- source duplication mix

def source_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication profile: how much of each source's
    volume is exact-duplicate text (normalized md5 seen more than
    once ANYWHERE in the corpus). The triage view a pipeline runs
    before deciding which feeds to de-prioritize — a source whose
    dup_ratio is high is mostly re-crawl.

    Shape: one hash-groupBy over md5(norm_text) for corpus-wide
    multiplicity, joined back onto the (source, hash) pairs, then a
    per-source aggregate. No driver-side loop, no skew (md5 keys).
    The dup-hash side carries NO broadcast hint: it grows with the
    corpus's duplication level — exactly the regime this triage view
    targets — so AQE picks broadcast only when the measured size
    allows (the same unguarded-broadcast fix ADVICE r5 applied to
    decontaminate_ngram)."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    hashed = d.select("source", F.md5(norm_text("text")).alias("h"))
    dup_hashes = (
        hashed.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("h")
    )
    flagged = hashed.join(dup_hashes.withColumn("is_dup", F.lit(1)), "h", "left")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("bigint").alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            _ratio(F.col("n_dup_docs"), F.col("n_docs")).alias("dup_ratio"),
        )
        .orderBy("source")
    )


SOURCE_DUP_SQL = """
WITH hashed AS (
  SELECT source, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents),
dup_hashes AS (
  SELECT h FROM hashed GROUP BY h HAVING COUNT(*) > 1)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dup_hashes.h) AS BIGINT) AS n_dup_docs,
       CAST(CAST(COUNT(dup_hashes.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(38,6)) AS dup_ratio
FROM hashed LEFT JOIN dup_hashes ON hashed.h = dup_hashes.h
GROUP BY source
ORDER BY source
"""


# ------------------------------------------- cleaning-funnel summary

FUNNEL_MIN_TOKENS = 5
FUNNEL_MAX_TOKENS = 100_000
FUNNEL_MAX_PUNCT = 0.30


def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning-pipeline FUNNEL: how many documents survive each
    successive intake gate — the one-row-per-stage summary every
    corpus build reports before training.

        0 total → 1 non-empty → 2 token-count band →
        3 punctuation cap → 4 exact-dedup survivor

    Stages nest (each row counts docs passing ITS gate and every
    gate before it), so the counts are monotone non-increasing.
    One corpus pass computes all gate flags map-side; the dedup
    stage adds the usual md5 hash-groupBy. Fractions are exact-int
    divisions cast to DECIMAL(38,6) like every ratio here."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    n_tok = F.size(tokens("text")).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    g1 = F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    g2 = g1 & n_tok.between(FUNNEL_MIN_TOKENS, FUNNEL_MAX_TOKENS)
    punct_ok = (
        count_matches("text", "[.,;:!?]").cast("double")
        <= F.lit(FUNNEL_MAX_PUNCT) * n_chars.cast("double")
    )
    g3 = g2 & punct_ok
    flagged = d.select(
        "doc_id",
        F.md5(norm_text("text")).alias("h"),
        g1.alias("g1"), g2.alias("g2"), g3.alias("g3"),
    ).localCheckpoint()  # one corpus pass feeds both 1-row aggregates
    gates = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("g1").cast("bigint")).alias("n1"),
        F.sum(F.col("g2").cast("bigint")).alias("n2"),
        F.sum(F.col("g3").cast("bigint")).alias("n3"),
    )
    survivors = (
        flagged.filter("g3")
        .groupBy("h")
        .agg(F.min("doc_id").alias("s"))
        .agg(F.count(F.lit(1)).alias("n4"))
    )
    # two 1-row frames → broadcast cross (the sanctioned scalar
    # pattern) → explode into the 5 funnel stages; fully lazy, no
    # driver-side action inside the operator
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("stage"),
                F.lit(nm).alias("stage_name"),
                F.col(col).alias("n_docs"),
            )
            for i, (nm, col) in enumerate(
                [
                    ("total", "n0"),
                    ("non_empty", "n1"),
                    ("token_band", "n2"),
                    ("punct_cap", "n3"),
                    ("dedup_survivor", "n4"),
                ]
            )
        ]
    )
    return (
        gates.crossJoin(F.broadcast(survivors))
        .select(F.col("n0"), F.explode(stages).alias("x"))
        .select(
            F.col("x.stage").alias("stage"),
            F.col("x.stage_name").alias("stage_name"),
            F.col("x.n_docs").alias("n_docs"),
            _ratio(F.col("x.n_docs"), F.col("n0")).alias("frac_of_total"),
        )
        .orderBy("stage")
    )


CORPUS_FUNNEL_SQL = f"""
WITH f AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
         (text IS NOT NULL AND length(trim(text)) > 0) AS g1,
         (text IS NOT NULL AND length(trim(text)) > 0
          AND len(regexp_split_to_array(trim(text), '\\s+'))
              BETWEEN {FUNNEL_MIN_TOKENS} AND {FUNNEL_MAX_TOKENS}) AS g2,
         (text IS NOT NULL AND length(trim(text)) > 0
          AND len(regexp_split_to_array(trim(text), '\\s+'))
              BETWEEN {FUNNEL_MIN_TOKENS} AND {FUNNEL_MAX_TOKENS}
          AND CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
              <= {FUNNEL_MAX_PUNCT} * CAST(length(text) AS DOUBLE)) AS g3
  FROM documents),
stages(stage, stage_name, n_docs) AS (
  SELECT 0, 'total', COUNT(*) FROM f
  UNION ALL SELECT 1, 'non_empty', COUNT(*) FILTER (WHERE g1) FROM f
  UNION ALL SELECT 2, 'token_band', COUNT(*) FILTER (WHERE g2) FROM f
  UNION ALL SELECT 3, 'punct_cap', COUNT(*) FILTER (WHERE g3) FROM f
  UNION ALL SELECT 4, 'dedup_survivor',
    (SELECT COUNT(*) FROM (SELECT h FROM f WHERE g3 GROUP BY h) s))
SELECT CAST(stage AS BIGINT) AS stage, stage_name,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CAST(n_docs AS DOUBLE)
          / CAST((SELECT COUNT(*) FROM f) AS DOUBLE) AS DECIMAL(38,6)) AS frac_of_total
FROM stages
ORDER BY stage
"""


def quality_score_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality scorer — the continuous companion to the
    rule-gate `text_quality`: a fixed, documented weight vector over
    four interpretable features (stopword ratio, alphabetic ratio,
    average token length, saturating length), the shape a
    fasttext-style quality model takes once distilled to a linear
    head. All ratios are SINGLE double divisions over exact integer
    counts and the logit is one fixed-order expression tree, so the
    doubles are bit-identical across engines (per-doc rows: no
    order-dependent double reductions anywhere).

    Weights are engine-pinned constants, not a trained artifact —
    swap them for real trained weights without touching the plan.
    """
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks_sql = "split(trim(text), '\\\\s+')"
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    n_chars = F.length("text").cast("double")
    tok_len_sum = F.expr(
        "aggregate(transform(split(trim(text), '\\\\s+'), t -> length(t)),"
        " 0, (acc, x) -> acc + x)"
    ).cast("double")
    non_alpha = (F.length("text") - count_matches("text", "[a-zA-Z]")).cast("double")
    stop_hits = stopword_hits(toks_sql, STOPWORDS_EN).cast("double")

    stop_ratio = stop_hits / n_tokens
    alpha_ratio = F.lit(1.0) - non_alpha / n_chars
    avg_tok_len = tok_len_sum / n_tokens
    len_norm = F.least(n_chars, F.lit(2000.0)) / F.lit(2000.0)
    logit = (
        F.lit(-1.5)
        + F.lit(3.0) * stop_ratio
        + F.lit(2.0) * alpha_ratio
        + F.lit(0.1) * avg_tok_len
        + F.lit(1.0) * len_norm
    )
    return d.select(
        "doc_id",
        logit.alias("quality_logit"),
        F.when(logit > F.lit(0.94), 1).otherwise(0).cast("bigint").alias("keep"),
    ).orderBy("doc_id")


_QL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_QL_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

QUALITY_LINEAR_SQL = f"""
WITH f AS (
  SELECT doc_id,
    CAST(len({_QL_TOKS}) AS DOUBLE) AS n_tokens,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(list_sum(list_transform({_QL_TOKS}, x -> length(x))) AS DOUBLE) AS tok_len_sum,
    CAST(length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE) AS non_alpha,
    CAST(len(list_filter({_QL_TOKS}, t -> t IN ({_QL_STOPS}))) AS DOUBLE) AS stop_hits
  FROM documents)
SELECT doc_id,
  -1.5 + 3.0 * (stop_hits / n_tokens)
       + 2.0 * (1.0 - non_alpha / n_chars)
       + 0.1 * (tok_len_sum / n_tokens)
       + 1.0 * (least(n_chars, 2000.0) / 2000.0) AS quality_logit,
  CAST(CASE WHEN -1.5 + 3.0 * (stop_hits / n_tokens)
                 + 2.0 * (1.0 - non_alpha / n_chars)
                 + 0.1 * (tok_len_sum / n_tokens)
                 + 1.0 * (least(n_chars, 2000.0) / 2000.0) > 0.94
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f
ORDER BY doc_id
"""


def _doc_bigrams(d: DataFrame) -> DataFrame:
    """(doc_id, bh) — one row per bigram OCCURRENCE, keyed by the
    md5 of the adjacent lowercase token pair (uniform shuffle keys
    by construction)."""
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    words = d.select("doc_id", toks.alias("w"))
    n = F.size("w")
    return (
        words.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("w", 1, n - F.lit(1)),
                    F.expr("slice(w, 2, size(w) - 1)"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws("\x1f", F.col("p.0"), F.col("p.1"))).alias("bh"),
        )
    )


LM_TOP_V_DEFAULT = 1 << 20  # ~1M bigrams ≈ 50 MB broadcast


def lm_bigram_stats_capped(
    spark: SparkSession, sf_dir: str, top_v: int = LM_TOP_V_DEFAULT
) -> DataFrame:
    """The 100 TB form of :func:`lm_bigram_stats`: the corpus model
    is capped to the ``top_v`` most frequent bigrams (ties broken on
    the hash for determinism) via ``orderBy().limit()`` —
    TakeOrderedAndProject, a map-side-reduced partial top-k, never a
    full sort — and BROADCAST to the scoring join, so the corpus is
    never shuffled on the model side. Tail bigrams (outside the
    top V) default to count 1, the minimum any observed bigram has;
    ``sum_bigram_count`` is therefore a lower bound that equals the
    exact answer whenever every doc bigram lands in the top V
    (pytest pins bit-equality at ``top_v`` ≥ distinct-bigram count;
    the bench ``lm_top_v`` sweep measures drift below it)."""
    bg = _doc_bigrams(load_table(spark, sf_dir, "documents", ["doc_id", "text"]))
    model = (
        bg.groupBy("bh")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "bh")
        .limit(top_v)
    )
    return (
        bg.join(F.broadcast(model), "bh", "left")
        .withColumn("c", F.coalesce("c", F.lit(1)))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("c").cast("bigint").alias("sum_bigram_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bigram_count",
            _ratio(F.col("sum_bigram_count"), F.col("n_bigrams")).alias(
                "avg_bigram_count"
            ),
        )
        .orderBy("doc_id")
    )


def lm_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM commonness score (round 7) — the CCNet/perplexity-
    filter shape without a float log-sum: "train" corpus-wide word-
    bigram counts in one aggregation, then score every document by
    how common its bigrams are. Rare-bigram documents are the
    OOD/noise candidates a perplexity filter flags; ultra-common
    ones the boilerplate.

    Per doc (≥1 bigram): ``n_bigrams``, ``sum_bigram_count`` (Σ of
    the GLOBAL count of each bigram occurrence) and
    ``avg_bigram_count`` — one double division of two exact ints,
    so the certified surface stays bit-exact across engines (a log-
    prob sum would be float-order-nondeterministic; consumers can
    take ``log`` of these integers themselves).

    Scale: bigram keys are md5 hashes (uniform shuffle keys); one
    groupBy builds the model, one re-join scores. At 100 TB use
    :func:`lm_bigram_stats_capped` — top-V broadcastable model with
    a defaulted tail; this full-join form is the exact gate."""
    bg = _doc_bigrams(load_table(spark, sf_dir, "documents", ["doc_id", "text"]))
    model = bg.groupBy("bh").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(model, "bh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("c").cast("bigint").alias("sum_bigram_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bigram_count",
            _ratio(F.col("sum_bigram_count"), F.col("n_bigrams")).alias(
                "avg_bigram_count"
            ),
        )
        .orderBy("doc_id")
    )


LM_BIGRAM_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM w WHERE len(w) >= 2),
bg AS (
  SELECT doc_id, md5(w[i] || chr(31) || w[i + 1]) AS bh FROM idx),
model AS (SELECT bh, COUNT(*) AS c FROM bg GROUP BY bh)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(model.c) AS BIGINT) AS sum_bigram_count,
       CAST(CAST(SUM(model.c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(38,6)) AS avg_bigram_count
FROM bg JOIN model USING (bh)
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""
