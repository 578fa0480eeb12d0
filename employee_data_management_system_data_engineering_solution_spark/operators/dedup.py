"""Document deduplication operators (north-star; BASELINE.json).

Four strategies, cheapest first. Everything but SimHash is pure
built-in expressions (codegen'd, no Python in the hot path):

* exact       — md5 over normalized text; one groupBy shuffle.
* minhash+LSH — word-set MinHash signature → band keys → bucket
                groupBy. Candidate generation is ONE shuffle on the
                band key; no pairwise comparison outside buckets. This
                is the 100 TB path: cost is O(corpus) + O(bucket²)
                only inside colliding buckets.
* n-gram Jaccard — exact Jaccard verification over char-5-gram sets
                for candidate pairs (use after LSH to confirm).
* simhash     — 64-bit bitwise-majority signature via Pandas UDF
                (Arrow-batched; the bit-twiddling isn't expressible as
                built-ins without a 64-wide expression fan-out).

Embedding-cosine near-dup lives in ``similarity.py`` (same LSH/bucket
pattern over vector space).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, minhash_signature, normalized


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) texts: one representative (min id)
    plus the duplicate count. Single hash-agg shuffle on the digest —
    at 100 TB the shuffle payload is one 32-byte key per distinct doc."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def with_minhash(df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8) -> DataFrame:
    """Attach an n-column MinHash signature (narrow map, no shuffle)."""
    return df.select(F.col(id_col), *minhash_signature(F.col(text_col), n_hashes))


def minhash_lsh_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """LSH candidate groups: split the signature into ``bands`` bands,
    md5 each band into a bucket key, explode doc→(band, bucket), and
    keep buckets holding >1 doc. Output: one row per colliding bucket
    with the member count and representative (min) ids.

    Scale: explode multiplies rows by ``bands`` (small constant); the
    groupBy shuffles 32-byte bucket keys. No cross join anywhere.
    """
    rows_per_band = n_hashes // bands
    sig = with_minhash(df, id_col, text_col, n_hashes)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    exploded = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_no"), F.col(f"band_{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, F.col("bb.band_no").alias("band_no"), F.col("bb.bucket").alias("bucket"))
    return (
        exploded.groupBy("band_no", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_jaccard: float = 0.8,
    prefilter_chars: int = 32,
) -> DataFrame:
    """Exact char-n-gram Jaccard over candidate pairs.

    Candidates are blocked on the first ``prefilter_chars`` chars of the
    normalized text (a cheap stand-in for LSH when signatures aren't
    materialized) so the self-join is per-block, never full cross.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(normalized(F.col(text_col)), 1, prefilter_chars).alias("block"),
        char_ngrams(F.col(text_col), n).alias("grams"),
    )
    a = base.select(
        F.col("doc_id").alias("id_a"), F.col("block"), F.col("grams").alias("grams_a")
    )
    b = base.select(
        F.col("doc_id").alias("id_b"), F.col("block"), F.col("grams").alias("grams_b")
    )
    pairs = a.join(b, on="block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size(F.array_union(F.col("grams_a"), F.col("grams_b")))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash via Arrow-batched Pandas UDF (mapInPandas).

    Per doc: hash each word to 64 bits (blake2b, stable across runs and
    workers — no PYTHONHASHSEED dependence), sum ±1 per bit position,
    sign → signature bit. Near-dups differ in few bits (hamming).
    """
    import hashlib

    def _batches(it):
        for pdf in it:
            out_ids, out_sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                counts = [0] * 64
                for w in (text or "").lower().split():
                    h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                    for bit in range(64):
                        counts[bit] += 1 if (h >> bit) & 1 else -1
                sig = 0
                for bit in range(64):
                    if counts[bit] > 0:
                        sig |= 1 << bit
                # store as signed int64
                if sig >= 1 << 63:
                    sig -= 1 << 64
                out_ids.append(doc_id)
                out_sigs.append(sig)
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sigs})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(_batches, _SIMHASH_SCHEMA)
