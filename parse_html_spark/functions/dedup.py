"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB target):
- exact dedup is a single hash-aggregate on md5(text) -- map-side partial
  aggregation, one shuffle on the 16-byte digest, no text movement;
- MinHash LSH shuffles only (band_id, band_hash, doc_id) tuples -- the
  band join is an equi-join on a short key, never a cross join;
- candidate pairs are verified with exact Jaccard only within buckets.
All hashing is deterministic (md5/crc32 with fixed seeds) so results are
stable across runs, partitionings and cluster sizes.
"""

import zlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textfn import fingerprint


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fp, n_docs, keeper).
    keeper = min id; only groups with n_docs > 1."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized text (min id wins)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# -- MinHash + LSH ---------------------------------------------------------

_MH_PRIME = (1 << 31) - 1  # Mersenne: a*h < 2^62 stays in int64


def _mh_coeffs(num_hashes: int):
    import numpy as np

    rng = np.random.RandomState(42)
    a = rng.randint(1, _MH_PRIME, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MH_PRIME, size=num_hashes, dtype=np.int64)
    return a, b


def _minhash_sig(text: str, num_hashes: int, shingle_words: int) -> list[int]:
    """MinHash signature: crc32 per shingle ONCE, then the num_hashes
    universal-hash permutations ((a*h+b) mod p) as one numpy outer
    product -- no per-seed Python loop."""
    import numpy as np

    toks = text.lower().split()
    if len(toks) < shingle_words:
        shingles = {" ".join(toks)} if toks else {""}
    else:
        shingles = {
            " ".join(toks[i : i + shingle_words])
            for i in range(len(toks) - shingle_words + 1)
        }
    h = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in shingles),
        dtype=np.int64,
        count=len(shingles),
    )
    a, b = _mh_coeffs(num_hashes)
    hm = h % _MH_PRIME
    perm = (a[:, None] * hm[None, :] + b[:, None]) % _MH_PRIME
    return perm.min(axis=1).tolist()


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) via an Arrow-batched pandas UDF."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _minhash_sig(t or "", num_hashes, shingle_words)
        )

    sig_udf = pandas_udf(_sig, "array<long>")

    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_words: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that collide in at
    least one LSH band. Shuffles only band keys, not text."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_words)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# -- SimHash ---------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) -- 64-bit SimHash over whitespace tokens using
    md5-derived token hashes (deterministic)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def one(text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
            ).astype(np.int64)
            acc += bits * 2 - 1
        out = 0
        for bit in np.where(acc > 0)[0]:
            out |= 1 << int(63 - bit)
        return out - (1 << 64) if out >= (1 << 63) else out

    def _sim(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    sim_udf = pandas_udf(_sim, "long")

    return df.select(F.col(id_col), sim_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on 16-bit
    chunks (a pair within distance 3 shares at least one of 4 chunks)."""
    sh = simhash64(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", k * 16).bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.alias("hamming")
    )


# -- n-gram Jaccard (ANSI-SQL expressible) ----------------------------------

def token_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact distinct-token-set Jaccard for all pairs sharing >= 1 token.
    Pure relational form (explode + equi-join + group) -- identical
    semantics in any SQL engine; the DuckDB oracle runs the same query."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(text_col)), r"\s+"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    sizes = toks.groupBy("id").agg(F.count("*").alias("n_tok"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )
