"""Deduplication operators over the documents/pages table.

Training-data-pipeline first-class citizens (per the engine charter):

  exact_dedup     hash-groupBy on text (md5 → canonical keep = min id)
  minhash         per-doc MinHash signature over token shingles; token
                  ids come from a dense vocabulary (sort-order ranked)
                  so the hash arithmetic is engine-portable integer math
  lsh_candidates  banding: docs sharing a (band, minhash-tuple) bucket
                  are near-dup candidates — the O(n) scale path
  near_dup_pairs  exact token-set Jaccard refine over LSH candidates
  simhash         64-bit-ish SimHash from token ids (bit-majority)

All are pure DataFrame/SQL ops (no UDFs): tokenization is split(),
shingling is a sequence/transform HOF, min-hashing is a groupBy(min).
At 10^12 docs the vocab dense-rank would be replaced by a fixed string
hash; here the rank join keeps DuckDB-parity (Spark's murmur3 is not
reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_P = 2147483647
# (mul, add) per minhash function
MINHASH_FUNCS = [
    (1664525, 1013904223),
    (22695477, 1),
    (69069, 362437),
    (1103515245, 12345),
    (134775813, 1),
    (214013, 2531011),
    (16807, 0),
    (48271, 0),
]


def tokens_df(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dup groups: md5(text), keep = min(doc_id), emit groups."""
    h = docs.select("doc_id", F.md5(F.col("text")).alias("text_md5"))
    return h.groupBy("text_md5").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def vocab(docs: DataFrame) -> DataFrame:
    """Dense token ids by sort order (deterministic, engine-portable)."""
    from pyspark.sql import Window as W

    toks = tokens_df(docs).select(F.explode("toks").alias("tok")).distinct()
    return toks.withColumn(
        "tok_id", F.row_number().over(W.orderBy("tok")).cast("bigint")
    )


def doc_token_ids(docs: DataFrame) -> DataFrame:
    toks = tokens_df(docs).select("doc_id", F.explode("toks").alias("tok"))
    return toks.join(vocab(docs), "tok", "inner").select("doc_id", "tok_id")


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """One row per (doc, hash_func): min over token hashes. Long format
    keeps it pure-aggregation (no arrays), perfectly partial-aggregable."""
    ids = doc_token_ids(docs)
    per_func = None
    for i, (m, a) in enumerate(MINHASH_FUNCS):
        h = ids.select(
            "doc_id",
            F.lit(i).alias("func_id"),
            ((F.col("tok_id") * m + a) % _P).alias("h"),
        )
        per_func = h if per_func is None else per_func.unionAll(h)
    return per_func.groupBy("doc_id", "func_id").agg(F.min("h").alias("minhash"))


def lsh_candidates(docs: DataFrame, bands: int = 4) -> DataFrame:
    """Band the signature (rows_per_band = n_funcs/bands) and bucket by
    the band tuple; emit candidate pairs (a<b) per band, deduped."""
    rows_per_band = len(MINHASH_FUNCS) // bands
    sig = minhash_signatures(docs).withColumn(
        "band", (F.col("func_id") / rows_per_band).cast("int")
    )
    # band key = deterministic fold of the band's minhashes (order-free sum
    # of position-weighted values — portable integer math)
    band_key = sig.groupBy("doc_id", "band").agg(
        F.sum((F.col("func_id") % rows_per_band + 1) * F.col("minhash")).alias("band_key")
    )
    a = band_key.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    b = band_key.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    pairs = a.join(b, ["band", "band_key"], "inner").filter(
        F.col("doc_a") < F.col("doc_b")
    )
    return pairs.select("doc_a", "doc_b").distinct()


def near_dup_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact token-set Jaccard refine over the LSH candidates."""
    cand = lsh_candidates(docs)
    tok_sets = (
        tokens_df(docs)
        .select("doc_id", F.explode("toks").alias("tok"))
        .distinct()
    )
    sizes = tok_sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ta = tok_sets.withColumnRenamed("doc_id", "doc_a")
    tb = tok_sets.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cand.join(ta, "doc_a", "inner")
        .join(
            tb,
            ["doc_b", "tok"],
            "inner",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b")
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_inter", "jaccard"
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: bit j of hash(tok_id) votes ±1; doc bit = majority.
    Realized as explode(bits) + sum aggregation — engine-portable."""
    ids = doc_token_ids(docs).withColumn(
        "h", (F.col("tok_id") * 2654435761 + 1013904223) % _P
    )
    bit = ids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        # portable bit extraction: floor(h / 2^bit) % 2 (POWER is exact
        # for bit < 53, works identically in Spark SQL and DuckDB)
        "vote",
        F.expr("CAST(FLOOR(h / POWER(2, bit)) AS BIGINT) % 2 * 2 - 1"),
    )
    votes = bit.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.expr("CASE WHEN v > 0 THEN CAST(POWER(2, bit) AS BIGINT) ELSE 0 END")
        ).alias("simhash")
    )
