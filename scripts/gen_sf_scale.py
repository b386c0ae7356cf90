#!/usr/bin/env python
"""Generate a scaled sf directory by replicating an existing one with
consistent key offsets — evidence tooling for above-bench-scale runs
(the sf1 headline table in BENCH_NOTES round 8).

    python scripts/gen_sf_scale.py /root/testdata/sf0.1 /tmp/sf1 10

Design choices, so the scaled workload measures what sf1 WOULD:

- region/nation stay fixed (TPC-H holds them constant across SF), and
  every replicated table offsets its own key AND its foreign keys by
  replica * base-cardinality, so referential joins keep sf0.1's
  fan-out instead of multiplying it.
- documents get CHIMERA text per replica — the first half of one base
  doc spliced to the second half of another, the pairing varying by
  replica via distinct prime strides. A plain copy (or a copy with a
  seed suffix) would be a ~1.0-Jaccard near-dup of its original, so
  minhash_lsh_pairs at 10x would measure a 90%-duplicate corpus
  (quadratic candidate blow-up) instead of a corpus that is simply 10x
  bigger; two chimeras share at most one half (~1/3 Jaccard, under the
  0.8 threshold), so the near-dup rate stays the base corpus's.
- embeddings apply a PER-REPLICA-DISTINCT norm-preserving transform
  (component rotation composed with a sign mask drawn from the
  replica index's bits), so cosine top-k at any multiplier ranks real
  candidates instead of byte-identical copies. Rotation alone is NOT
  injective (it cycles every dim-1 replicas — at mult > dim-1 each
  embedding would reappear verbatim under different vec_ids); the
  2^dim distinct sign masks make the transform injective for any
  practical mult.
- replication offsets keys by replica * base-cardinality, which is
  collision-free ONLY for dense 0..N-1 key domains — these fixtures'
  shape, ASSERTED before replicating. Sparse keys (real TPC-H
  o_orderkey runs ~4x count) would silently alias across replicas.
- events offset event_id/user_id and keep ts: the stream's event-time
  span is part of its semantics (windows per hour), so scaling adds
  events per window, not more calendar.
- an optional trailing ``--skew FRAC`` argument redirects FRAC of the
  fact rows to ONE hot key after replication (lineitem.l_suppkey -> 0,
  orders.o_custkey -> 0, md5-selected rows) — PERF evidence tooling
  for how the unsalted headline joins behave under real key skew (AQE
  skew-split or not). Join RESULTS change, so a skew directory is for
  benchmarking only, never for correctness sweeps.

Only ~2x base memory is held at once (one table, narrow projections);
everything else is Spark-side unions written straight back out.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# distinct prime strides per replica keep chimera pairings collision-free
_P1, _P2 = 7919, 104729


def _offset(df: DataFrame, i: int, counts: dict[str, int], cols: dict[str, str]):
    """Replica ``i`` of ``df`` with every key column in ``cols`` offset
    by i * its base table's cardinality (cols maps column -> table)."""
    out = df
    for col, table in cols.items():
        out = out.withColumn(col, F.col(col) + F.lit(i * counts[table]))
    return out


def _assert_dense_keys(
    df: DataFrame, name: str, counts: dict[str, int], cols: dict[str, str]
) -> None:
    """Offset-by-count replication is collision-free only when every
    offset column's values live in [0, count(its base table)) — true
    for these dense-keyed fixtures, silently key-aliasing otherwise
    (sparse domains like real TPC-H o_orderkey need offset by
    max(key)+1 instead). Fail loudly before writing anything."""
    aggs = []
    for col in cols:
        aggs += [F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}")]
    row = df.agg(*aggs).first()
    for col, table in cols.items():
        lo, hi = row[f"min_{col}"], row[f"max_{col}"]
        if lo is None or lo < 0 or hi >= counts[table]:
            raise SystemExit(
                f"{name}.{col}: values [{lo}, {hi}] not within "
                f"[0, {counts[table]}) of base table '{table}' — "
                "offset-by-count replication would alias keys across "
                "replicas; this tool requires dense 0..N-1 key domains"
            )


def _replicate(df: DataFrame, mult: int, counts, cols) -> DataFrame:
    parts = [_offset(df, i, counts, cols) for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _chimera_docs(docs: DataFrame, mult: int, n: int) -> DataFrame:
    """Replica 0 is the base corpus; replica i >= 1 splices doc
    (d + i*_P1) % n's first half to doc (d + i*_P2 + 13) % n's second
    half (character-level halves — shingle-equivalent for dedup)."""
    halves = docs.select(
        "doc_id",
        F.substring("text", 1, (F.length("text") / 2).cast("int")).alias("h1"),
        F.expr("substring(text, CAST(length(text) / 2 AS INT) + 1)").alias(
            "h2"
        ),
        "lang",
        "source",
    )
    parts = [docs]
    for i in range(1, mult):
        a = halves.select(
            ((F.col("doc_id") - i * _P1) % n + n) % n, F.col("h1"), "lang", "source"
        ).toDF("doc_id", "h1", "lang", "source")
        b = halves.select(
            ((F.col("doc_id") - (i * _P2 + 13)) % n + n) % n, F.col("h2")
        ).toDF("doc_id", "h2")
        parts.append(
            a.join(b, "doc_id")
            .select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.concat(F.col("h1"), F.col("h2")).alias("text"),
                "lang",
                "source",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _rotated_embeddings(emb: DataFrame, mult: int, n: int, dim: int) -> DataFrame:
    """Replica ``i`` applies rotate(1 + i % (dim-1)) COMPOSED WITH the
    sign mask of i's bits (component p multiplied by (-1)^bit_p(i)) —
    norm-preserving, and injective per replica: rotation alone cycles
    every dim-1 replicas, but no two replicas i != j < 2^dim share a
    sign mask, so no embedding ever reappears byte-identically under a
    different vec_id at any practical multiplier."""
    parts = [emb]
    for i in range(1, mult):
        dim_rot = 1 + (i % (dim - 1))
        signs = [-1.0 if (i >> p) & 1 else 1.0 for p in range(dim)]
        rotated = F.concat(
            F.expr(f"slice(embedding, {dim_rot + 1}, size(embedding))"),
            F.expr(f"slice(embedding, 1, {dim_rot})"),
        )
        masked = F.zip_with(
            rotated,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: (x * s).cast("float"),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                masked.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _md5_unit(expr) -> F.Column:
    """Deterministic uniform in (0, 1]: first 8 md5 hex chars as a
    32-bit integer, shifted off zero — engine-reproducible (DuckDB's
    md5 agrees byte for byte, the sweep fingerprint discipline)."""
    return (
        F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("double") + 1.0
    ) / F.lit(4294967296.0)


def _md5_normal(tag: str, *parts) -> F.Column:
    """Deterministic standard normal: Box-Muller over two independent
    md5-derived uniforms keyed by (tag, parts)."""
    key = F.concat_ws("\x1f", F.lit(tag), *[p.cast("string") for p in parts])
    u1 = _md5_unit(F.concat(key, F.lit("|u1")))
    u2 = _md5_unit(F.concat(key, F.lit("|u2")))
    import math

    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)


def _clustered_embeddings(
    spark: SparkSession, n_total: int, dim: int, k: int, noise: float = 0.35
) -> DataFrame:
    """Mixture-of-Gaussians embeddings around md5-seeded centers —
    the --clustered mode (round-10 verdict): the standing rotated
    corpus has deliberately WEAK cluster structure (recall@10 0.12 at
    nprobe=1), which under-sells IVF in its intended regime and can't
    motivate n_list/nprobe defaults. Here vector v belongs to cluster
    md5(v) % k; each component is center(c, p) + noise * N(0,1)(v, p),
    all draws Box-Muller over md5 — deterministic, partitioning-free,
    and replayable by any engine with md5 + ln/cos. Per-component unit
    centers put inter-center distance ~ sqrt(2 * dim) >> the noise
    norm (~noise * sqrt(dim)), so clusters are genuinely separable."""
    base = spark.range(n_total).select(F.col("id").alias("vec_id"))
    c = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cl|"), F.col("vec_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % k
    ).alias("label_long")
    base = base.select("vec_id", c)
    comps = [
        (
            _md5_normal("ctr", F.col("label_long"), F.lit(p))
            + F.lit(noise) * _md5_normal("nz", F.col("vec_id"), F.lit(p))
        ).cast("float")
        for p in range(dim)
    ]
    return base.select(
        "vec_id",
        F.array(*comps).alias("embedding"),
        F.col("label_long").cast("int").alias("label"),
    )


def _skewed(df: DataFrame, key_col: str, id_expr, frac: float) -> DataFrame:
    """Redirect ~frac of rows' ``key_col`` to hot key 0, selected by a
    deterministic md5 over ``id_expr`` (the row's own identity, NOT the
    key, so the hot rows spread over the whole table)."""
    pct = F.conv(F.substring(F.md5(id_expr), 1, 8), 16, 10).cast("long") % 100
    return df.withColumn(
        key_col,
        F.when(pct < int(round(frac * 100)), F.lit(0)).otherwise(F.col(key_col)),
    )


def main() -> None:
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    skew, clustered, only_tables = 0.0, 0, None
    rest = sys.argv[4:]
    while rest:
        if rest[0] == "--skew":
            skew, rest = float(rest[1]), rest[2:]
        elif rest[0] == "--clustered":
            clustered, rest = int(rest[1]), rest[2:]
        elif rest[0] == "--tables":
            only_tables, rest = set(rest[1].split(",")), rest[2:]
        else:
            raise SystemExit(
                f"unknown argument {rest[0]} (expected --skew FRAC, "
                "--clustered K, or --tables a,b,c)"
            )
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(os.cpu_count()))
        # a wide-multiplier lineitem write OOMs the 1g default (many
        # concurrent parquet writer buffers); this is a generator tool,
        # take a real heap
        .config(
            "spark.driver.memory",
            os.environ.get("GEN_SF_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", "false")
        .appName("gen-sf-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(dst, exist_ok=True)

    read = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))
    counts = {
        t: read(t).count()
        for t in ("customer", "supplier", "part", "orders", "documents",
                  "embeddings", "events", "lineitem")
    }
    # every offset column must be dense in its base table's [0, count)
    # (see _assert_dense_keys) — checked up front, before any writes
    offset_cols: dict[str, dict[str, str]] = {
        "customer": {"c_custkey": "customer"},
        "supplier": {"s_suppkey": "supplier"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
        "lineitem": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
        "documents": {"doc_id": "documents"},
        "embeddings": {"vec_id": "embeddings"},
        "events": {"event_id": "events", "user_id": "events"},
    }
    for table, cols in offset_cols.items():
        _assert_dense_keys(read(table), table, counts, cols)
    # the sign-mask transform needs one uniform embedding dim (a
    # dim-length mask zip_with'd over a shorter array would null-pad)
    dims = [
        r[0]
        for r in read("embeddings").select(F.size("embedding")).distinct().collect()
    ]
    if len(dims) != 1:
        raise SystemExit(f"embeddings must share one dim, found sizes {sorted(dims)}")
    dim = dims[0]
    plans: dict[str, DataFrame] = {
        "region": read("region"),
        "nation": read("nation"),
        "customer": _replicate(
            read("customer"), mult, counts, offset_cols["customer"]
        ),
        "supplier": _replicate(
            read("supplier"), mult, counts, offset_cols["supplier"]
        ),
        "part": _replicate(read("part"), mult, counts, offset_cols["part"]),
        "orders": _replicate(read("orders"), mult, counts, offset_cols["orders"]),
        "lineitem": _replicate(
            read("lineitem"), mult, counts, offset_cols["lineitem"]
        ),
        "documents": _chimera_docs(
            read("documents"), mult, counts["documents"]
        ),
        "embeddings": _rotated_embeddings(
            read("embeddings"), mult, counts["embeddings"], dim
        ),
        "events": _replicate(
            read("events"), mult, counts, offset_cols["events"]
        ),
    }
    if clustered:
        # --clustered K: swap the embeddings plan for the md5-seeded
        # Gaussian mixture (ANN-quality benching — typically written
        # with --tables embeddings; the other tables are untouched by
        # it, but the directory's embeddings no longer correspond to
        # the standing rotated corpus, so keep it out of standing
        # correctness tallies)
        plans["embeddings"] = _clustered_embeddings(
            spark, counts["embeddings"] * mult, dim, clustered
        )
    if only_tables is not None:
        unknown = only_tables - set(plans)
        if unknown:
            raise SystemExit(f"--tables: unknown tables {sorted(unknown)}")
        plans = {t: df for t, df in plans.items() if t in only_tables}
    if skew > 0 and "lineitem" in plans:
        plans["lineitem"] = _skewed(
            plans["lineitem"],
            "l_suppkey",
            F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
            skew,
        )
    if skew > 0 and "orders" in plans:
        plans["orders"] = _skewed(
            plans["orders"], "o_custkey", F.col("o_orderkey").cast("string"), skew
        )
    written: dict[str, int] = {}
    for name, df in plans.items():
        # generated (clustered) embeddings compare by type signature
        # only: expression-built columns legitimately differ from the
        # base parquet in nullability flags, never in types
        drifted = (
            df.schema.simpleString() != read(name).schema.simpleString()
            if (clustered and name == "embeddings")
            else df.schema != read(name).schema
        )
        if drifted:
            raise SystemExit(
                f"{name}: scaled schema {df.schema.simpleString()} drifted "
                f"from base {read(name).schema.simpleString()}"
            )
        df.coalesce(max(1, mult // 2)).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        written[name] = spark.read.parquet(
            os.path.join(dst, f"{name}.parquet")
        ).count()
        print(f"{name}: {written[name]} rows")
    # provenance sidecar: sweep_scale.py echoes this in its log header,
    # so a future ad-hoc regeneration can't silently change the corpus
    # under previously recorded tallies (the stores.py input_key
    # discipline, applied to the scale directories themselves)
    with open(os.path.join(dst, "_PROVENANCE.json"), "w") as f:
        json.dump(
            {
                "generator": "scripts/gen_sf_scale.py",
                "argv": sys.argv[1:],
                "src": src,
                "mult": mult,
                "skew": skew,
                "clustered": clustered,
                "tables": sorted(plans),
                "base_counts": counts,
                "written_counts": written,
                "dense_key_assertion": "passed for "
                + ", ".join(sorted(offset_cols)),
                "embedding_dim": dim,
            },
            f,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
