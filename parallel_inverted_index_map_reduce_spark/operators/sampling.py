"""Deterministic sampling for training-data pipelines.

RNG-based sampling (``df.sample``) is reproducible only per
(seed, partitioning) — repartition the input and the sample changes.
These operators key every decision on a content hash
(functions/hashing.py, the same md5 family the dedup/sketch ops use),
so the sample is a pure function of the DATA: stable across runs,
partitionings, engines, and cluster sizes. That property is what makes
a 100 TB pipeline debuggable — re-running any slice reproduces the
exact same training set.

All decisions are per-row filters on a codegen hash expression: no
shuffle, no state, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32

_HASH_SPACE = float(2**32)


def _unit_hash(key: Column, salt: str) -> Column:
    """Uniform [0, 1) from the md5 hash of (salt, key) — the salt
    decorrelates different sampling decisions over the same keys."""
    return stable_hash32(F.concat_ws("\x1f", F.lit(salt), key.cast("string"))) / F.lit(
        _HASH_SPACE
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by the key's hash alone.

    Sampling by a KEY (not the whole row) keeps entity cohorts intact:
    sampling events by user_id keeps every event of a kept user, which
    is what longitudinal analyses need.
    """
    return df.where(_unit_hash(F.col(key), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: str,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum fractions (absent strata drop to 0) — hash-decided,
    so rerunning yields the identical sample."""
    frac = None
    for value, f in fractions.items():
        case = F.when(F.col(strata_col) == value, F.lit(float(f)))
        frac = case if frac is None else frac.when(
            F.col(strata_col) == value, F.lit(float(f))
        )
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.where(_unit_hash(F.col(key), salt) < frac)


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """(train, test): disjoint, exhaustive, leak-proof by construction —
    one hash decides each key's side, so an entity can never straddle
    the boundary (the classic eval-leak bug when splitting by row)."""
    h = _unit_hash(F.col(key), salt)
    test = df.where(h < F.lit(float(test_fraction)))
    train = df.where(h >= F.lit(float(test_fraction)))
    return train, test
