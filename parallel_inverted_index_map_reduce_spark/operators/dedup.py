"""Deduplication operators for large-corpus pipelines.

The reference dedups (word, doc) pairs inside its reducer
(/root/reference/src/main.cpp:183-200); these operators generalize that
to whole-document dedup at training-pipeline scale:

- exact:    hash-groupBy on the document text (one shuffle; at 100 TB
            hash first so the shuffle moves 16-byte digests, not texts)
- minhash:  shingle -> 16-permutation MinHash -> banded LSH buckets ->
            candidate pairs -> exact-Jaccard verify. Only bucket
            collisions are verified, so the pair stage never goes
            quadratic in the corpus; everything is built-in exprs
            (md5/conv arithmetic), no Python in the hot path.
- simhash:  32-bit sign-aggregated fingerprints; near-dups = pairs with
            small Hamming distance (bit_count(xor)).

All hashing uses functions/hashing.py so the DuckDB oracle reproduces
results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    minhash_expr,
    stable_hash32,
)


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, keep_doc_id, n_dups): canonical doc per distinct text."""
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def token_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok): 0-based positions, empty tokens kept out but
    positions assigned before filtering (identical in the oracle)."""
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .where(F.col("tok") != "")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle_hash): distinct hashed n-gram token shingles."""
    toks = token_positions(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = toks.select(
        "doc_id",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
        ).alias("shingle"),
        *[F.lead("tok", i).over(w).alias(f"_t{i}") for i in range(1, n)],
    )
    for i in range(1, n):
        sh = sh.where(F.col(f"_t{i}").isNotNull())
    return (
        sh.select("doc_id", stable_hash32(F.col("shingle")).alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, perm_id, minhash): one row per doc per permutation.

    The permutation table is a 16-row literal — the cross join is a
    broadcast nested loop over a tiny side, then one groupBy(doc, perm).
    """
    sh = shingles(docs)
    spark = docs.sparkSession
    perms = spark.createDataFrame(
        [(i, MINHASH_A[i], MINHASH_B[i]) for i in range(len(MINHASH_A))],
        "perm_id INT, a LONG, b LONG",
    )
    return (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm_id")
        .agg(
            F.min(
                (F.col("a") * F.col("shingle_hash") + F.col("b"))
                % F.lit(4_294_967_311)
            ).alias("minhash")
        )
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Band the signatures and emit distinct candidate (doc_a, doc_b)
    pairs that collide in at least one band."""
    banded = signatures.withColumn(
        "band_id", F.floor(F.col("perm_id") / F.lit(LSH_ROWS)).cast("int")
    )
    sigs = (
        banded.groupBy("doc_id", "band_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("perm_id", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, doc_shingles: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only."""
    sizes = doc_shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = doc_shingles.select(F.col("doc_id").alias("doc_a"), "shingle_hash")
    sh_b = doc_shingles.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle_hash").alias("sh_b")
    )
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .where(F.col("shingle_hash") == F.col("sh_b"))  # becomes part of the equi-join
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_common": 0})
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # decimal round-trip: integer ratios can land on exact
            # decimal ties where double round(…,6) differs per engine
            F.round(
                (
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                ).cast("decimal(28,12)"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("jaccard"),
        )
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit sign-aggregated token-hash fingerprint."""
    toks = token_positions(docs).select(
        "doc_id", stable_hash32(F.col("tok")).alias("h")
    )
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"),
    ).select(
        "doc_id",
        "j",
        F.when(F.expr("shiftright(h, j) & 1") == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("contrib"),
    )
    per_bit = bits.groupBy("doc_id", "j").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
