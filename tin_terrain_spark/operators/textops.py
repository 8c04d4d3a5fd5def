"""Text-analysis operators over documents/pages (training-data pipeline).

  text_stats      token count, char count, avg token length, distinct
                  token ratio, stopword ratio, quality score
  lang_profile    per-(lang, source) aggregates
  fingerprints    order-sensitive document fingerprint via
                  position-weighted token hashing (sum form, so it is
                  aggregation-order-free and engine-portable)
  langid          n-gram-free heuristic language scorer (stopword hits)

All pure Column expressions / SQL — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def text_stats(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars2"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.length(F.regexp_replace(F.col("text"), " ", "")) / F.size(toks), 6).alias(
            "avg_tok_len"
        ),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).alias("n_stopwords"),
    ).withColumn(
        "quality",
        F.round(
            (F.col("n_distinct_tokens") / F.col("n_tokens"))
            * (1.0 - F.col("n_stopwords") / F.col("n_tokens")),
            6,
        ),
    )


def sql_text_stats() -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
      WITH base AS (
        SELECT doc_id, lang,
               length(text) AS n_chars2,
               string_split(text, ' ') AS toks
        FROM documents
      ), s AS (
        SELECT doc_id, lang, n_chars2,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct_tokens,
               round(CAST(length(replace(array_to_string(toks, ' '), ' ', '')) AS DOUBLE) / len(toks), 6) AS avg_tok_len,
               len(list_filter(toks, t -> t IN ({sw}))) AS n_stopwords
        FROM base
      )
      SELECT doc_id, lang, n_chars2, n_tokens, n_distinct_tokens, avg_tok_len,
             n_stopwords,
             round((CAST(n_distinct_tokens AS DOUBLE) / n_tokens)
                   * (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens), 6) AS quality
      FROM s
    """


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive fingerprint: sum over positions of
    (pos+1) * ((len(token)*131 + first_char_code) mod P) — exact integer
    math, order captured by position weights, sum order irrelevant."""
    ex = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    h = ex.withColumn(
        "th",
        (F.length("tok") * 131 + F.ascii(F.col("tok"))) % 65521,
    )
    return h.groupBy("doc_id").agg(
        F.sum(((F.col("pos") + 1) * F.col("th")).cast("bigint")).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


SQL_FINGERPRINTS = """
  SELECT doc_id,
         CAST(sum(CAST(pos AS BIGINT) * ((length(tok) * 131 + ascii(tok)) % 65521)) AS BIGINT) AS fingerprint,
         count(*) AS n_tokens
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  )
  GROUP BY doc_id
"""


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
# the shape of the GPT-2 pre-tokenizer split, without the \p classes
# that differ across regex engines (plain classes are identical in
# Java regex and RE2/DuckDB)
BPE_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting both ways the charter lists: whitespace tokens
    and BPE-ish regex tokens, plus the punctuation ratio used by
    quality filters. Pure Column expressions (regexp_count is
    codegen'd JVM-side)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PAT)).cast("bigint").alias("bpe_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
            / F.length(F.col("text")),
            6,
        ).alias("punct_ratio"),
    )


def sql_token_counts() -> str:
    return f"""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS BIGINT) AS bpe_tokens,
             round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                   / length(text), 6) AS punct_ratio
      FROM documents
    """


def normalize_text(docs: DataFrame) -> DataFrame:
    """Text normalization (the pipeline's canonicalization step):
    lowercase, trim, collapse whitespace runs. Emits the normalized
    length and an md5 witness so the row is scalar-comparable; the
    normalized text itself stays internal (100 TB of strings don't
    travel for a checksum)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), "  +", " ")
    return docs.select(
        "doc_id",
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
        (norm == F.col("text")).alias("already_normal"),
    )


SQL_NORMALIZE_TEXT = """
  SELECT doc_id,
         length(regexp_replace(trim(lower(text)), '  +', ' ', 'g')) AS n_chars_norm,
         md5(regexp_replace(trim(lower(text)), '  +', ' ', 'g')) AS norm_md5,
         regexp_replace(trim(lower(text)), '  +', ' ', 'g') = text AS already_normal
  FROM documents
"""


def langid(docs: DataFrame) -> DataFrame:
    """Heuristic language id: stopword-hit rate as the 'en' score —
    the deterministic stand-in for an n-gram language profile (the
    synthetic corpus has no real language signal; the operator shape —
    per-doc vectorized scoring + argmax — is what carries to real
    data)."""
    toks = F.split(F.col("text"), " ")
    en_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        F.round(en_hits / F.size(toks), 6).alias("en_score"),
    ).withColumn(
        "pred_lang", F.when(F.col("en_score") > 0.05, F.lit("en")).otherwise(F.lit("other"))
    )


def sql_langid() -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
      SELECT doc_id, lang, en_score,
             CASE WHEN en_score > 0.05 THEN 'en' ELSE 'other' END AS pred_lang
      FROM (
        SELECT doc_id, lang,
               round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS en_score
        FROM documents
      )
    """
