"""Dedup query specs (exact, MinHash+LSH, SimHash, n-gram Jaccard).

Every hash bottoms out in md5 (identical across engines), so even the
MinHash-LSH pipeline has an exact SQL oracle. Shared CTE text mirrors
operators/dedup.py stage for stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    NUM_PERM,
    sql_stable_hash32,
)
from ..operators import dedup as dd
from .exprs import sql_stable_round6, stable_round6
from ..sources.tables import load_table
from .registry import register

# (doc_id, pos, tok): 0-based positions, empties filtered after
# position assignment — mirrors dedup.token_positions.
TOKS_POS_CTE = r"""
tokpos AS (
    SELECT doc_id, tok, pos
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(0, len(string_split(text, ' ')))) AS pos
        FROM documents
    )
    WHERE tok <> ''
)
"""

SHINGLES_CTE = (
    TOKS_POS_CTE
    + r""",
sh_raw AS (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle,
           lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2
    FROM tokpos
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shingles AS (
    SELECT DISTINCT doc_id,
           CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS shingle_hash
    FROM sh_raw WHERE t1 IS NOT NULL AND t2 IS NOT NULL
)
"""
)

_PERM_ROWS = ", ".join(
    f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(len(MINHASH_A))
)

MINHASH_CTE = (
    SHINGLES_CTE
    + f""",
perms(perm_id, a, b) AS (VALUES {_PERM_ROWS}),
sigs AS (
    SELECT s.doc_id, p.perm_id,
           min((p.a * s.shingle_hash + p.b) % {MINHASH_P}) AS minhash
    FROM shingles s CROSS JOIN perms p
    GROUP BY s.doc_id, p.perm_id
),
bands AS (
    SELECT doc_id, CAST(floor(perm_id / {LSH_ROWS}) AS INT) AS band_id,
           string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm_id) AS band_sig
    FROM sigs
    GROUP BY doc_id, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_sig = b.band_sig
     AND a.doc_id < b.doc_id
)
"""
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
    tags=("dedup",),
    doc="Exact dedup: hash-groupBy on text, canonical = min doc_id.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup_groups(_docs(spark, sf_dir))


@register(
    "minhash_lsh_pairs",
    oracle="WITH "
    + MINHASH_CTE
    + """
SELECT doc_a, doc_b FROM cand
""",
    tags=("dedup", "lsh"),
    bench=True,
    doc="MinHash(16 perms) + LSH(8 bands x 2 rows) candidate pairs.",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.lsh_candidate_pairs(_docs(spark, sf_dir))


@register(
    "minhash_near_dups",
    oracle="WITH "
    + MINHASH_CTE
    + """,
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle_hash = sa.shingle_hash
    GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       CAST(CAST(round(CAST(COALESCE(i.n_common, 0) * 1.0
             / (za.n_sh + zb.n_sh - COALESCE(i.n_common, 0)) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
""",
    tags=("dedup", "lsh"),
    doc="LSH candidates verified with exact shingle-set Jaccard.",
)
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sh = dd.shingles(docs)
    pairs = dd.lsh_candidate_pairs(docs)
    return dd.jaccard_verify(pairs, sh)


@register(
    "dedup_clusters",
    oracle="WITH RECURSIVE "
    + MINHASH_CTE
    + """,
canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
exact_groups AS (
    SELECT md5(text) AS h, min(doc_id) AS keep FROM documents GROUP BY md5(text)
),
exact_edges AS (
    SELECT g.keep AS a, d.doc_id AS b
    FROM documents d JOIN exact_groups g ON md5(d.text) = g.h
    WHERE d.doc_id <> g.keep
),
ccand AS (
    SELECT c.doc_a, c.doc_b FROM cand c
    JOIN canon ka ON ka.doc_id = c.doc_a
    JOIN canon kb ON kb.doc_id = c.doc_b
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM ccand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle_hash = sa.shingle_hash
    GROUP BY c.doc_a, c.doc_b
),
near_edges AS (
    SELECT c.doc_a AS a, c.doc_b AS b
    FROM ccand c
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sizes za ON za.doc_id = c.doc_a
    JOIN sizes zb ON zb.doc_id = c.doc_b
    WHERE CAST(CAST(round(CAST(COALESCE(i.n_common, 0) * 1.0
              / (za.n_sh + zb.n_sh - COALESCE(i.n_common, 0)) AS DECIMAL(28,12)), 6)
              AS DECIMAL(18,6)) AS DOUBLE) >= 0.8
),
edges0 AS (
    SELECT a, b FROM exact_edges UNION SELECT a, b FROM near_edges
),
edges AS (SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
),
comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
clusters AS (
    SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
best AS (
    SELECT cluster_id, doc_id AS keep_doc_id FROM (
        SELECT cl.cluster_id, cl.doc_id,
               row_number() OVER (PARTITION BY cl.cluster_id
                                  ORDER BY d.n_chars DESC, cl.doc_id ASC) AS r
        FROM clusters cl JOIN documents d ON d.doc_id = cl.doc_id
    ) WHERE r = 1
)
SELECT cl.doc_id, cl.cluster_id,
       (cl.doc_id = b.keep_doc_id) AS keep
FROM clusters cl JOIN best b ON b.cluster_id = cl.cluster_id
""",
    tags=("dedup", "graph"),
    doc="Cluster-level dedup policy: equivalence classes under "
    "'byte-identical OR verified Jaccard >= 0.8' via DataFrame-native "
    "connected components (operators/components.py — hash-min label "
    "propagation with pointer jumping, O(log L) shuffle rounds, "
    "lineage truncated per round), then keep-the-longest-member per "
    "cluster as one max_by aggregation (cluster_representatives). The "
    "oracle recomputes the same graph and resolves components with a "
    "recursive-CTE reachability closure — an independent formulation "
    "proving the iterative propagation exact. Singletons keep "
    "themselves; ties break to the smallest doc_id.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import cluster_representatives, near_dup_clusters

    docs = _docs(spark, sf_dir)
    clusters = near_dup_clusters(docs, threshold=0.8)
    scores = docs.select("doc_id", "n_chars")
    return cluster_representatives(clusters, scores, score_col="n_chars")


# Span width for the pipeline_hygiene entry: small enough that the
# synthetic corpus's near-dup documents actually share spans (the
# production default of 20 also fires on this corpus, but 8 exercises
# overlap-unioning much harder), large enough to stay cross-document
# boilerplate rather than common phrases.
_SPAN_N = 8

# Merge rounds for the BPE parts of pipeline_hygiene: enough rounds to
# exercise tie-breaking and the greedy rewrite on the synthetic
# vocabulary, small enough that the generated oracle SQL stays readable.
_BPE_MERGES = 6

# Mixing/split parameters for the export/mix/split parts. DYADIC values
# only (exact in binary): the keep-fraction solve then contains no
# rounding the two engines could disagree on — every float op in
# _mix_fractions (w/total with total exactly 1.0, n/w with dyadic w,
# scale*w, one final /n) is either exact or a single correctly-rounded
# IEEE op mirrored in the same order by the oracle SQL, so the
# Python-computed fractions and the SQL-recomputed ones are
# bit-identical and the hash-threshold keep decisions match row for
# row. 'zh' is deliberately absent: strata outside the weights map must
# DROP.
_MIX_WEIGHTS = {"en": 0.5, "es": 0.25, "de": 0.125, "fr": 0.125}
_SPLIT_FRAC = 0.125
_EXPORT_SHARDS = 8

# Temperature for the 'temp_w' part: alpha=0.5 genuinely exercises the
# n^alpha power (unlike 0 or 1, which degenerate to constants/identity).
# Cross-engine safety comes from the weight solve's determinism
# discipline (sampling.py _temperature_weights_from_counts): round-9
# powers + decimal-summed normalizer, mirrored verbatim by the SQL twin.
_TEMP_ALPHA = 0.5

# Chunking parameters for the 'chunk' part: small enough that the
# synthetic docs (median ~56 tokens) actually split into several
# overlapping windows, exercising the last-start bound.
_CHUNK_TOKENS = 32
_CHUNK_OVERLAP = 8
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP

# CDC parameters for the 'cdc' part: window 3 makes boundary decisions
# genuinely local, divisor 8 targets ~8-token expected chunks so the
# synthetic docs (median ~56 tokens) split into several content-defined
# segments.
_CDC_WINDOW = 3
_CDC_DIVISOR = 8

# Sample sizes for the 'priority' / 'quota' parts: 25 of 500 docs keeps
# the weighted draw selective; 10 per lang is an eval-set-sized quota.
_PRIORITY_K = 25
_QUOTA_K = 10

# Token budget for the 'pack' part: deliberately SMALLER than
# _CHUNK_TOKENS so full-width chunks exercise the oversize-singleton
# rule (a doc at/over budget opens its own bin) while tail chunks
# exercise real multi-chunk packing — both branches of the greedy loop
# land in the driver-verified invariants.
_PACK_BUDGET = 30


# ---- composed-pipeline parts ('pipe_streamed' / 'pipe_batch') ----------
# Batch boundaries for the streamed prep pipeline's three deterministic
# doc_id-range micro-batches at sf0.01 (500 docs): terciles put verified
# near-dup pairs BOTH within batches ((87,134), (285,301), (393,420)...)
# and across them — including the chain 45 -> 267 -> 413 spanning all
# three, so the persistent signature store must suppress a near-dup of a
# doc landed two batches earlier. At other SFs the slices degrade
# gracefully (sf0.001's 50 docs all land in batch 0; later batches are
# legal zero-row commits).
_PIPE_B1, _PIPE_B2 = 167, 334
_PIPE_MINQ = 0.3
_PIPE_THRESH = 0.8
# the batch-composed part additionally exercises the language filter
_PIPE_BATCH_LANGS = ("en", "es")
# chunk params shared with the 'chunk' part so the oracle's cwins CTE
# serves both; budget only shapes bin_id, which the hash excludes (the
# packer's bin numbering follows partition layout — its invariants are
# the 'pack' part's job)
_PIPE_PREP_KW = dict(
    min_quality=_PIPE_MINQ,
    dedup_threshold=_PIPE_THRESH,
    chunk_tokens=_CHUNK_TOKENS,
    overlap=_CHUNK_OVERLAP,
    budget=256,
)

# INVARIANT the pipe oracles depend on: these CTEs replay the prep
# composition over RAW document text, while the engine's first stage is
# scrub_text — the two agree because the synthetic documents corpus
# contains no PII-shaped text (no '@', no digits), making scrub the
# identity. tests/test_chunking_scrub.py::test_documents_fixture_is_
# scrub_identity pins this: if a future data generator ever emits
# scrubbables, that test fails loudly instead of these parts going
# silently red. (A full SQL replay of scrub is impossible — the phone
# stage's lookaround pattern is not RE2-expressible, as the 'scrub'
# part documents.)
#
# MinHash chain over the oracle's existing `shingles` CTE, pp_-prefixed
# so it composes into pipeline_hygiene's WITH block without colliding
# with MINHASH_CTE's names. MATERIALIZED: the per-batch scopes below
# reference these (and each other) many times over — DuckDB's default
# inlining of the nested scope chain blows the plan up combinatorially
# (measured: minutes vs seconds on the sf0.01 corpus).
_PIPE_BASE_CTE = f"""
pp_perms(perm_id, a, b) AS (VALUES {_PERM_ROWS}),
pp_sigs AS MATERIALIZED (
    SELECT s.doc_id, p.perm_id,
           min((p.a * s.shingle_hash + p.b) % {MINHASH_P}) AS minhash
    FROM shingles s CROSS JOIN pp_perms p
    GROUP BY s.doc_id, p.perm_id
),
pp_bands AS MATERIALIZED (
    SELECT doc_id, CAST(floor(perm_id / {LSH_ROWS}) AS INT) AS band_id,
           string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm_id) AS band_sig
    FROM pp_sigs GROUP BY doc_id, 2
),
pp_sizes AS MATERIALIZED (
    SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
),
pp_quality AS MATERIALIZED (
    SELECT doc_id FROM tokpos GROUP BY doc_id
    HAVING CAST(CAST(round(CAST(
        0.4 * (sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                   THEN 1 ELSE 0 END) * 1.0 / count(*))
      + 0.3 * least(sum(length(tok)) * 1.0 / count(*) / 10.0, 1.0)
      + 0.3 * least(count(*) * 1.0 / 100.0, 1.0) AS DECIMAL(28,12)), 6)
        AS DECIMAL(18,6)) AS DOUBLE) >= {_PIPE_MINQ}
)"""


def _pipe_dedup_cte(p: str, scope: str) -> str:
    """CTE chain reproducing ``near_dup_keep_list`` (operators/dedup.py)
    over the doc-id set in CTE ``scope``, stage for stage: exact dedup
    (min doc_id per md5(text)) -> LSH band collisions among the
    canonical survivors -> exact shingle-Jaccard verify (round-6
    decimal, cast double, >= threshold — the engine's comparison
    verbatim) -> drop doc_b of every qualifying pair. ``{p}_kept`` is
    the surviving doc-id set."""
    return f"""
{p}_ek AS MATERIALIZED (
    SELECT min(x.doc_id) AS doc_id
    FROM {scope} x JOIN documents d ON d.doc_id = x.doc_id
    GROUP BY md5(d.text)
),
{p}_cand AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pp_bands a JOIN pp_bands b
      ON a.band_id = b.band_id AND a.band_sig = b.band_sig
     AND a.doc_id < b.doc_id
    JOIN {p}_ek ka ON ka.doc_id = a.doc_id
    JOIN {p}_ek kb ON kb.doc_id = b.doc_id
),
{p}_inter AS MATERIALIZED (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM {p}_cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b
     AND sb.shingle_hash = sa.shingle_hash
    GROUP BY 1, 2
),
{p}_kept AS MATERIALIZED (
    SELECT doc_id FROM {p}_ek
    EXCEPT
    SELECT DISTINCT c.doc_b
    FROM {p}_cand c
    LEFT JOIN {p}_inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN pp_sizes za ON za.doc_id = c.doc_a
    JOIN pp_sizes zb ON zb.doc_id = c.doc_b
    WHERE CAST(CAST(round(CAST(COALESCE(i.n_common, 0) * 1.0
          / (za.n_sh + zb.n_sh - COALESCE(i.n_common, 0)) AS DECIMAL(28,12)), 6)
          AS DECIMAL(18,6)) AS DOUBLE) >= {_PIPE_THRESH}
)"""


def _pipe_cross_cte(p: str, lo: int | None, hi: int | None, landed: str) -> str:
    """Cross-batch suppression + in-batch scope for the doc_id slice
    [lo, hi): a new doc drops BEFORE the in-batch pipeline iff a banded
    candidate against the landed signature store carries a MinHash
    agreement estimate >= threshold (streaming/pipeline.py
    process_batch; estimator = fraction of agreeing components,
    dedup.minhash_estimate — 16 longs per landed doc, never its text).
    ``{p}_scope`` = slice ∩ quality survivors ∩ not-suppressed."""
    bounds = " AND ".join(
        ([f"a.doc_id >= {lo}"] if lo is not None else [])
        + ([f"a.doc_id < {hi}"] if hi is not None else [])
    )
    qbounds = bounds.replace("a.doc_id", "q.doc_id")
    # candidate pairs MUST collapse to distinct (new, landed) BEFORE the
    # per-perm estimator join (mirroring lsh_cross_candidates' distinct):
    # a pair colliding in B bands would otherwise contribute B copies of
    # each signature row and the agreement sum would read B*A instead of
    # A — suppressing pairs whose true estimate is below the threshold
    # whenever B*A/16 crosses it (a latent false-red for any corpus with
    # a multi-band collision under 0.8 estimated similarity).
    return f"""
{p}_cp AS MATERIALIZED (
    SELECT DISTINCT a.doc_id, l.doc_id AS landed_id
    FROM pp_bands a JOIN pp_bands l
      ON a.band_id = l.band_id AND a.band_sig = l.band_sig
    JOIN {landed} lp ON lp.doc_id = l.doc_id
    WHERE {bounds}
),
{p}_cc AS MATERIALIZED (
    SELECT DISTINCT c.doc_id
    FROM {p}_cp c
    JOIN pp_sigs sa ON sa.doc_id = c.doc_id
    JOIN pp_sigs sl ON sl.doc_id = c.landed_id AND sl.perm_id = sa.perm_id
    GROUP BY c.doc_id, c.landed_id
    HAVING sum(CASE WHEN sa.minhash = sl.minhash THEN 1 ELSE 0 END) * 1.0
           / {NUM_PERM} >= {_PIPE_THRESH}
),
{p}_scope AS MATERIALIZED (
    SELECT q.doc_id FROM pp_quality q
    WHERE {qbounds}
      AND q.doc_id NOT IN (SELECT doc_id FROM {p}_cc)
)"""


# the full unrolled 3-batch replay + the whole-corpus batch composition
_PIPE_CTES = (
    _PIPE_BASE_CTE
    + f""",
p0_scope AS MATERIALIZED (
    SELECT doc_id FROM pp_quality WHERE doc_id < {_PIPE_B1}
)"""
    + ","
    + _pipe_dedup_cte("p0", "p0_scope")
    + ","
    + _pipe_cross_cte("p1", _PIPE_B1, _PIPE_B2, "p0_kept")
    + ","
    + _pipe_dedup_cte("p1", "p1_scope")
    + """,
pp_land1 AS MATERIALIZED (
    SELECT doc_id FROM p0_kept UNION SELECT doc_id FROM p1_kept
)"""
    + ","
    + _pipe_cross_cte("p2", _PIPE_B2, None, "pp_land1")
    + ","
    + _pipe_dedup_cte("p2", "p2_scope")
    + """,
pp_kept AS MATERIALIZED (
    SELECT doc_id FROM pp_land1 UNION SELECT doc_id FROM p2_kept
),
pb_scope AS MATERIALIZED (
    SELECT q.doc_id FROM pp_quality q JOIN documents d ON d.doc_id = q.doc_id
    WHERE d.lang IN ("""
    + ", ".join(f"'{s}'" for s in _PIPE_BATCH_LANGS)
    + """)
)"""
    + ","
    + _pipe_dedup_cte("pb", "pb_scope")
)

def _streamed_prep_store(spark: SparkSession, sf_dir: str, docs: DataFrame) -> str:
    """Run the incremental prep pipeline (streaming/pipeline.py) over
    three DETERMINISTIC doc_id-range micro-batches and return the
    committed output dir (session-memoized — plans/stores.py). Each
    slice lands as one parquet file followed by a full availableNow run
    against the SAME checkpoint, so batch membership and order are
    exact (one file -> one batch) and the restart path — resume after a
    committed batch — is exercised twice per build. Cross-batch exact +
    near-dup suppression runs against the persistent signature store
    the earlier batches committed."""
    from ..streaming import pipeline as spipe
    from .stores import drain, input_key, session_store, tuned_shuffle

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        slices = [
            F.col("doc_id") < _PIPE_B1,
            (F.col("doc_id") >= _PIPE_B1) & (F.col("doc_id") < _PIPE_B2),
            F.col("doc_id") >= _PIPE_B2,
        ]
        with tuned_shuffle(spark):
            for b, pred in enumerate(slices):
                docs.where(pred).coalesce(1).write.mode("append").parquet(src)
                stream = spark.readStream.schema(docs.schema).parquet(src)
                drain(
                    spipe.start_incremental_prep(
                        stream,
                        out,
                        ckpt,
                        cross_batch_threshold=_PIPE_THRESH,
                        languages=(),
                        **_PIPE_PREP_KW,
                    ),
                    f"streamed prep batch {b}",
                )
        return out

    return session_store("prep_stream", input_key(sf_dir, docs), build)


def _batch_prep_store(spark: SparkSession, sf_dir: str, docs: DataFrame) -> str:
    """Land the COMPOSED batch pipeline (pipeline.py run_and_land:
    scrub -> lang filter -> quality filter -> one-pass near-dup dedup ->
    chunk -> pack -> hive-partitioned sink) and return the output dir
    (session-memoized — plans/stores.py); the part reads what actually
    LANDED, so a stage-reorder regression turns the driver row red."""
    from .. import pipeline as bpipe
    from .stores import input_key, session_store, tuned_shuffle

    def build(tmp: str) -> str:
        out = os.path.join(tmp, "landed")
        with tuned_shuffle(spark):
            bpipe.run_and_land(
                spark, docs, out, languages=_PIPE_BATCH_LANGS, **_PIPE_PREP_KW
            )
        return out

    return session_store("prep_batch", input_key(sf_dir, docs), build)


def _sql_salted_unit_hash(salt: str) -> str:
    """SQL twin of sampling._unit_hash / export.training_order's hash:
    md5 over salt + US + key, as a [0, 1) double (division by 2^32 is
    exact)."""
    h = sql_stable_hash32(f"'{salt}' || chr(31) || CAST(doc_id AS VARCHAR)")
    return f"({h} / 4294967296.0)"


def _bpe_cte(n_merges: int) -> str:
    """Generated CTE chain that reproduces the BPE trainer
    (operators/bpe.py train_bpe) AND the greedy segmenter (apply_bpe)
    in pure SQL — the cross-engine proof that an ITERATIVE algorithm's
    Spark implementation is exact, expressed by unrolling the loop.

    The encoding trick that makes each round one scalar expression:
    a word's symbol list is a string with every symbol wrapped in
    chr(31) sentinels (``\\x1fs1\\x1f\\x1fs2\\x1f...``). Greedy
    left-to-right merging of adjacent pair (l, r) is then EXACTLY SQL's
    non-overlapping left-to-right ``replace`` of ``\\x1fl\\x1f\\x1fr\\x1f``
    with ``\\x1flr\\x1f``: the sentinels anchor whole-symbol matches (a
    suffix can never false-match), and because scanning resumes after
    each replacement, a token created by this round can never re-merge
    as a left side within the round — the same two invariants the
    engine's aggregate-fold (bpe.py _merge_once) relies on. Documents
    concatenate word encodings with chr(30), which no pattern can span,
    so whole-corpus application per round is one replace too. Each
    round r: adjacent pairs of the split vocab (bp{r}), argmax with the
    trainer's total tie-break (bt{r}: count desc, left, right), rewrite
    vocab and docs (bv{r}, bd{r}); LEFT JOIN ON TRUE keeps rows alive
    if a round finds no pair (fully merged vocabulary)."""
    sep, wsep = "chr(31)", "chr(30)"
    enc_word = (
        f"{sep} || array_to_string(list_transform(range(1, length(word)+1), "
        f"i -> word[i]), {sep}||{sep}) || {sep}"
    )
    ctes = [
        r"""
btoks AS (
    SELECT doc_id, word,
           row_number() OVER (PARTITION BY doc_id ORDER BY rp) AS wpos
    FROM (
        SELECT doc_id,
               regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word, rp
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok,
                   unnest(range(0, len(string_split_regex(text, '\s+')))) AS rp
            FROM documents
        )
        WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
    )
)""",
        f"bv0 AS (SELECT {enc_word} AS enc, count(*) AS n "
        "FROM btoks GROUP BY word)",
        f"bd0 AS (SELECT doc_id, array_to_string(list({enc_word} "
        f"ORDER BY wpos), {wsep}) AS enc FROM btoks GROUP BY doc_id)",
    ]
    pat = f"{sep}||t.l||{sep}||{sep}||t.rr||{sep}"
    rep = f"{sep}||t.l||t.rr||{sep}"
    for r in range(1, n_merges + 1):
        ctes.append(
            f"""
bp{r} AS (
    SELECT s[i] AS l, s[i+1] AS rr, sum(n) AS c
    FROM (SELECT string_split(trim(enc, {sep}), {sep}||{sep}) AS s, n
          FROM bv{r - 1}),
         unnest(range(1, len(s))) AS u(i)
    GROUP BY 1, 2
),
bt{r} AS (SELECT l, rr, c FROM bp{r} ORDER BY c DESC, l, rr LIMIT 1),
bv{r} AS (
    SELECT CASE WHEN t.l IS NULL THEN v.enc
           ELSE replace(v.enc, {pat}, {rep}) END AS enc, v.n
    FROM bv{r - 1} v LEFT JOIN bt{r} t ON TRUE
),
bd{r} AS (
    SELECT d.doc_id,
           CASE WHEN t.l IS NULL THEN d.enc
           ELSE replace(d.enc, {pat}, {rep}) END AS enc
    FROM bd{r - 1} d LEFT JOIN bt{r} t ON TRUE
)"""
        )
    merge_rows = "\nUNION ALL ".join(
        f"SELECT CAST({r - 1} AS BIGINT) AS id_a, l || ' ' || rr AS metric, "
        f"CAST(c AS BIGINT) AS n FROM bt{r}"
        for r in range(1, n_merges + 1)
    )
    ctes.append(
        f"""
bmerges AS ({merge_rows}),
bfinal AS (
    SELECT doc_id,
           replace(replace(replace(enc, {sep}||{sep}, ' '), {sep}, ''),
                   {wsep}, ' ') AS toks
    FROM bd{n_merges}
)"""
    )
    return ",".join(ctes)

SPAN_DEDUP_CTE = rf"""
rawtok AS (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY rp) - 1 AS pos
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(text, '\s+')) AS tok,
               unnest(range(0, len(string_split_regex(text, '\s+')))) AS rp
        FROM documents
    ) WHERE tok <> ''
),
arr AS (SELECT doc_id, list(tok ORDER BY pos) AS tks FROM rawtok GROUP BY doc_id),
grams AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(list_transform(
               list_slice(tks, i + 1, i + {_SPAN_N}),
               t -> regexp_replace(lower(t), '[^a-z]', '', 'g')), ' ')) AS gh
    FROM arr, unnest(range(0, greatest(len(tks) - {_SPAN_N} + 1, 0))) AS u(i)
),
dupg AS (
    SELECT gh, min(doc_id) AS canon_doc
    FROM grams GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
),
cuts AS (
    SELECT g.doc_id, g.pos FROM grams g JOIN dupg d USING (gh)
    WHERE g.doc_id <> d.canon_doc
),
covered AS (
    SELECT DISTINCT c.doc_id, c.pos + u.j AS tokpos
    FROM cuts c, unnest(range(0, {_SPAN_N})) AS u(j)
),
kept AS (
    SELECT r.doc_id, r.pos, r.tok
    FROM rawtok r LEFT JOIN covered cv
      ON cv.doc_id = r.doc_id AND cv.tokpos = r.pos
    WHERE cv.tokpos IS NULL
),
keptagg AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
           count(*) AS n_kept
    FROM kept GROUP BY doc_id
),
rawn AS (SELECT doc_id, count(*) AS n_raw FROM rawtok GROUP BY doc_id)
"""


@register(
    "pipeline_hygiene",
    oracle="WITH "
    + SHINGLES_CTE
    + ",\n"
    + SPAN_DEDUP_CTE
    + ",\n"
    + _bpe_cte(_BPE_MERGES)
    + f""",
tr AS (SELECT doc_id AS train_id, shingle_hash FROM shingles WHERE doc_id < 400),
ev AS (SELECT doc_id AS eval_id, shingle_hash FROM shingles WHERE doc_id >= 400),
evs AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY eval_id),
common AS (
    SELECT train_id, eval_id, count(*) AS n_common
    FROM tr JOIN ev USING (shingle_hash) GROUP BY 1, 2
),
mixc AS (
    SELECT lang, count(*) AS n FROM documents
    WHERE lang IN ({", ".join(f"'{s}'" for s in sorted(_MIX_WEIGHTS))})
    GROUP BY lang
),
mixw AS (
    SELECT lang, n,
           CAST(CASE lang {" ".join(f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items()))} END AS DOUBLE) AS w
    FROM mixc
),
mixs AS (SELECT min(n / w) AS scale FROM mixw),
mixf AS (
    SELECT lang, n,
           least(CAST(1.0 AS DOUBLE), (SELECT scale FROM mixs) * w / n) AS frac
    FROM mixw
),
tmpc AS (
    SELECT lang, count(*) AS n FROM documents
    WHERE lang IS NOT NULL GROUP BY lang
),
tmpr AS (
    SELECT lang, n,
           round(pow(CAST(n AS DOUBLE), {_TEMP_ALPHA}), 9) AS r
    FROM tmpc
),
tmpt AS (
    SELECT CAST(SUM(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS t FROM tmpr
),
ctoks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tks
    FROM documents
),
cwins AS (
    SELECT doc_id, s // {_CHUNK_STRIDE} AS chunk_id,
           list_slice(tks, s + 1, s + {_CHUNK_TOKENS}) AS ck
    FROM ctoks,
         unnest(range(0,
                      (greatest(0, len(tks) - {_CHUNK_OVERLAP + 1})
                       // {_CHUNK_STRIDE}) * {_CHUNK_STRIDE} + 1,
                      {_CHUNK_STRIDE})) AS u(s)
),
cdcb AS (
    SELECT doc_id, tks,
           list_filter(range({_CDC_WINDOW}, len(tks) + 1),
             i -> CAST('0x' || substr(md5(array_to_string(
                      list_slice(tks, i - {_CDC_WINDOW - 1}, i), chr(31))),
                      1, 8) AS BIGINT) % {_CDC_DIVISOR} = 0
           ) AS bps
    FROM ctoks
),
cdcseg AS (
    SELECT doc_id, u.j - 1 AS chunk_id,
           list_slice(tks,
                      list_concat([1], list_transform(bps, p -> p + 1))[u.j],
                      list_concat(bps, [len(tks)])[u.j]) AS ck
    FROM cdcb, unnest(range(1, len(bps) + 2)) AS u(j)
),
pri AS (
    SELECT doc_id, n_chars,
           round(-ln(({sql_stable_hash32("'priority' || chr(31) || CAST(doc_id AS VARCHAR)")} + 1)
                     / 4294967296.0)
                 / greatest(CAST(n_chars AS DOUBLE), 1.0), 9) AS p
    FROM documents
),
prik AS (
    SELECT doc_id, n_chars, p,
           row_number() OVER (ORDER BY p, doc_id) AS rk
    FROM pri
),
quo AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
               ORDER BY {sql_stable_hash32("'quota' || chr(31) || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rk
    FROM documents WHERE lang IS NOT NULL
),
pii AS (
    SELECT doc_id,
           coalesce(text, '') || ' contact doc' || CAST(doc_id AS VARCHAR)
           || '@example.com via 10.0.' || CAST(doc_id // 256 AS VARCHAR)
           || '.' || CAST(doc_id % 256 AS VARCHAR) || ' now' AS t
    FROM documents
),
piie AS (
    SELECT doc_id, t,
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                          '<EMAIL>', 'g') AS te
    FROM pii
)"""
    + ","
    + _PIPE_CTES
    + f"""
SELECT 'span_dedup' AS op, d.doc_id AS id_a, CAST(0 AS BIGINT) AS id_b,
       CAST(coalesce(rn.n_raw, 0) - coalesce(ka.n_kept, 0) AS BIGINT) AS n,
       md5(coalesce(ka.text, '')) AS metric
FROM documents d
LEFT JOIN rawn rn ON rn.doc_id = d.doc_id
LEFT JOIN keptagg ka ON ka.doc_id = d.doc_id
UNION ALL
SELECT 'decontam', c.train_id, c.eval_id, CAST(c.n_common AS BIGINT),
       {sql_stable_round6('c.n_common * 1.0 / e.n_eval')}
FROM common c JOIN evs e USING (eval_id)
WHERE CAST(c.n_common AS DECIMAL(28,12)) / CAST(e.n_eval AS DECIMAL(28,12))
      >= CAST('0.3' AS DECIMAL(28,12))
UNION ALL
SELECT 'bpe_merge', id_a, CAST(0 AS BIGINT), n, metric FROM bmerges
UNION ALL
SELECT 'bpe_doc', d.doc_id, CAST(0 AS BIGINT),
       CAST(CASE WHEN coalesce(b.toks, '') = '' THEN 0
            ELSE len(string_split(b.toks, ' ')) END AS BIGINT),
       md5(coalesce(b.toks, ''))
FROM documents d LEFT JOIN bfinal b ON b.doc_id = d.doc_id
UNION ALL
SELECT 'export', doc_id,
       CAST(eh % {_EXPORT_SHARDS} AS BIGINT), eh, ''
FROM (SELECT doc_id,
             {sql_stable_hash32("'export' || chr(31) || CAST(doc_id AS VARCHAR)")} AS eh
      FROM documents)
UNION ALL
SELECT 'mix_keep', d.doc_id, CAST(0 AS BIGINT), CAST(1 AS BIGINT), d.lang
FROM documents d JOIN mixf f ON f.lang = d.lang
WHERE {_sql_salted_unit_hash('mix')} < f.frac
UNION ALL
SELECT 'mix_frac', CAST(0 AS BIGINT), CAST(0 AS BIGINT), n,
       lang || '=' || {sql_stable_round6('frac')}
FROM mixf
UNION ALL
SELECT 'temp_w', CAST(0 AS BIGINT), CAST(0 AS BIGINT), n,
       lang || '=' || {sql_stable_round6('r / (SELECT t FROM tmpt)')}
FROM tmpr
UNION ALL
SELECT 'split', doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CASE WHEN {_sql_salted_unit_hash('split')} < CAST({_SPLIT_FRAC} AS DOUBLE)
            THEN 'test' ELSE 'train' END
FROM documents
UNION ALL
SELECT 'chunk', doc_id, chunk_id, CAST(len(ck) AS BIGINT),
       md5(array_to_string(ck, ' '))
FROM cwins WHERE len(ck) > 0
UNION ALL
SELECT 'pack', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(count(*) AS BIGINT), 'rows'
FROM cwins WHERE len(ck) > 0
UNION ALL
SELECT 'pack', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(count(*) AS BIGINT), 'distinct_keys'
FROM cwins WHERE len(ck) > 0
UNION ALL
SELECT 'pack', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(coalesce(sum(len(ck)), 0) AS BIGINT), 'token_sum'
FROM cwins WHERE len(ck) > 0
UNION ALL
SELECT 'pack', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), 'overfull_multi'
UNION ALL
SELECT 'pack', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(count(*) AS BIGINT), 'oversize_bins'
FROM cwins WHERE len(ck) > {_PACK_BUDGET}
UNION ALL
SELECT 'cdc', doc_id, chunk_id, CAST(len(ck) AS BIGINT),
       md5(array_to_string(ck, ' '))
FROM cdcseg WHERE len(ck) > 0
UNION ALL
SELECT 'cdc_dup', MIN(doc_id), CAST(count(DISTINCT doc_id) AS BIGINT),
       CAST(count(*) AS BIGINT), md5(array_to_string(ck, ' '))
FROM cdcseg WHERE len(ck) > 0
GROUP BY md5(array_to_string(ck, ' '))
HAVING count(DISTINCT doc_id) > 1
UNION ALL
SELECT 'priority', doc_id, rk, CAST(n_chars AS BIGINT),
       {sql_stable_round6('p')}
FROM prik WHERE rk <= {_PRIORITY_K}
UNION ALL
SELECT 'quota', doc_id, rk, CAST(0 AS BIGINT), lang
FROM quo WHERE rk <= {_QUOTA_K}
UNION ALL
SELECT 'scrub', doc_id,
       CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT),
       CAST(len(regexp_extract_all(te,
            '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b')) AS BIGINT),
       md5(regexp_replace(te, '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b',
                          '<IP>', 'g'))
FROM piie
UNION ALL
SELECT 'pipe_streamed', doc_id, chunk_id, CAST(len(ck) AS BIGINT),
       md5(array_to_string(ck, ' '))
FROM cwins JOIN pp_kept USING (doc_id) WHERE len(ck) > 0
UNION ALL
SELECT 'pipe_batch', doc_id, chunk_id, CAST(len(ck) AS BIGINT),
       md5(array_to_string(ck, ' '))
FROM cwins JOIN pb_kept USING (doc_id) WHERE len(ck) > 0
""",
    tags=("dedup", "pipeline", "hygiene"),
    doc="The two destructive hygiene passes of the training pipeline in "
    "one labeled result. 'span_dedup' rows (operators/spandedup.py "
    "remove_duplicate_spans, the ExactSubstr variant of Lee et al. 2022 "
    "over 8-token grams): one row per document with the md5 of its "
    "reconstructed text after every cross-document duplicated span "
    "outside its canonical (smallest doc_id) occurrence is cut, plus "
    "the exact token count removed — the engine's linear sorted-starts "
    "sweep is proven by the oracle's independent interval-cover "
    "formulation (each cut start covers [pos, pos+n); a token survives "
    "iff no cut covers it). 'decontam' rows (operators/decontam.py "
    "contamination_report): every (train, eval) pair whose 3-token "
    "shingle containment — the fraction of the EVAL doc's distinct "
    "shingles present in the train doc — reaches 0.3, over the "
    "doc_id<400 / >=400 split; the threshold compares in decimal so an "
    "exactly-at-threshold pair cannot evade flagging. "
    "'bpe_merge'/'bpe_doc' rows driver-verify the third pipeline "
    "tokenization mode, BPE (operators/bpe.py, Sennrich et al. 2016): "
    "train_bpe's learned merge list (rank, pair, corpus pair-count — "
    "deterministic argmax: count desc then pair asc) and every "
    "document's greedy segmentation under it (apply_bpe: token count + "
    "md5 of the token stream). The oracle UNROLLS the training loop as "
    "generated CTEs (see _bpe_cte: sentinel-delimited symbol strings "
    "make each greedy merge round one left-to-right replace), so an "
    "ITERATIVE algorithm gets the same exact cross-engine proof as the "
    "one-pass operators. 'export' rows driver-verify the deterministic "
    "shard export (operators/export.py training_order: shard and "
    "training order derived from a salted content hash — stable across "
    "runs, partitionings, and engines, unlike repartition/rand-based "
    "shuffles). 'mix_keep'/'mix_frac' rows verify domain mixing "
    "(operators/sampling.py mix_to_proportions over lang with DYADIC "
    "target weights, so the largest-achievable-output keep-fraction "
    "solve is bit-identical in both engines — see _MIX_WEIGHTS; the "
    "absent 'zh' stratum proves unweighted domains drop); 'temp_w' rows "
    "verify temperature-based domain weighting (sampling.py "
    "temperature_weights, the n^alpha corpus-mixing rule of the "
    "multilingual-sampling literature) at alpha=0.5 over ALL non-null "
    "langs — the weight solve's round-9 powers and decimal-summed "
    "normalizer make each weight one IEEE division the oracle "
    "reproduces bit-for-bit; 'split' rows "
    "verify the leak-proof hash train/test split. 'pack' rows "
    "driver-verify sequence packing (operators/packing.py "
    "pack_sequences, partition-local best-fit-decreasing over the "
    "chunk stream at budget 30 < chunk width 32): the greedy loop is "
    "not SQL-expressible, but its invariants are exact aggregates the "
    "oracle recomputes from the chunk stream alone — every chunk "
    "packed exactly once (rows == distinct_keys == the oracle's chunk "
    "count), token mass conserved (token_sum), no multi-chunk bin "
    "over budget (overfull_multi == 0), and over-budget chunks "
    "isolated as singleton bins (oversize_bins == the oracle's "
    "over-budget chunk count — a bin can only exceed the budget via "
    "exactly one oversize chunk, so the counts are a bijection). "
    "'cdc' rows driver-verify CONTENT-DEFINED chunking "
    "(chunking.py cdc_chunks, the hash-only LBFS boundary scheme of "
    "Muthitacharoen et al. 2001 at token granularity): a boundary "
    "falls after token i iff the md5 hash of the trailing 3-token "
    "window is divisible by 8, so an edit perturbs only the chunks "
    "overlapping it — the property chunk-level dedup relies on, which "
    "fixed-width chunking lacks; boundaries, segment slices, and "
    "segment hashes are one declarative projection the oracle "
    "reproduces bit-for-bit; 'cdc_dup' rows close the loop on WHY — "
    "cross-document duplicated blocks group on their chunk hash "
    "(storage-dedup style: min doc, distinct-doc count, occurrence "
    "count per duplicated block), one 16-byte-key groupBy, never a "
    "pairwise comparison. 'priority' rows driver-verify weighted "
    "sampling WITHOUT replacement (sampling.py priority_sample, "
    "Efraimidis & Spirakis 2006 A-Res with the salted key hash as the "
    "uniform draw): the 25 smallest round-9 priorities -ln(u)/w "
    "(w = n_chars) with their ranks and round-6 priority strings, "
    "bit-reproducible on both engines. 'quota' rows driver-verify "
    "exact per-stratum quotas (sampling.py quota_sample): the 10 "
    "hash-first docs per lang with their in-stratum ranks — the "
    "exactly-k-per-domain eval-set primitive a keep-fraction cannot "
    "promise. 'scrub' rows driver-verify PII redaction "
    "(functions/scrub.py): the digit-free corpus gets one synthetic "
    "email + one IP appended identically in both engines, and the md5 "
    "of the fully scrubbed text plus the per-stage counts cross-verify "
    "the email/IP regexp_replace chain (the phone stage's lookaround "
    "pattern is not RE2-expressible and matches nothing in this "
    "fixture; its behavior stays pytest-verified). "
    "'pipe_streamed' rows driver-verify the INCREMENTAL prep pipeline "
    "(streaming/pipeline.py): three deterministic doc_id-range "
    "micro-batches run availableNow in-session against one checkpoint "
    "(one slice file per run, so batch order and membership are exact "
    "and the resume-after-commit path runs twice); each batch runs the "
    "full prep flow (scrub -> quality filter -> within-batch near-dup "
    "dedup -> chunk -> pack) and lands exactly-once behind a commit "
    "marker, while near-dups of ALREADY-LANDED docs — including a "
    "chain spanning all three batches — are suppressed against the "
    "persistent MinHash signature store (16 longs per landed doc, "
    "never its text; estimator = fraction of agreeing components). "
    "The rows are the per-chunk md5s of what the stream COMMITTED; the "
    "oracle replays the whole composition batch by batch (unrolled "
    "CTEs: quality gate, estimator suppression vs the landed-so-far "
    "set, exact-dedup + LSH + Jaccard within each batch, chunking), "
    "so stream == batch-composition is hash-checked, not test-asserted. "
    "'pipe_batch' rows do the same for the COMPOSED batch pipeline "
    "(pipeline.py run_and_land over the full corpus with the language "
    "filter ON): per-chunk md5s of the hive-partitioned landed output "
    "vs the oracle's recomputed lang ∩ quality ∩ dedup survivor set — "
    "a stage-reorder regression turns the row red. Scale shape: "
    "span/decontam passes are equi-joins on md5 identities (gram "
    "groupBy + cut-list join; shingle join bounded by shared "
    "vocabulary) — never a cross join; BPE training collapses the "
    "corpus to its distinct-word frequency table in ONE scan and "
    "iterates on vocabulary-scale data, the driver holding only the "
    "merge list; export is one n_shards-way hash shuffle + "
    "within-partition sort, and mix/split are per-row hash filters "
    "with a strata-cardinality driver scalar.",
)
def q_pipeline_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import apply_bpe, merges_table, train_bpe
    from ..operators.decontam import contamination_report
    from ..operators.spandedup import remove_duplicate_spans

    docs = _docs(spark, sf_dir)
    sd = remove_duplicate_spans(docs, n=_SPAN_N).select(
        F.lit("span_dedup").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("n_tokens_removed").cast("long").alias("n"),
        F.md5(F.col("text").cast("binary")).alias("metric"),
    )
    dc = contamination_report(
        docs.where(F.col("doc_id") < 400),
        docs.where(F.col("doc_id") >= 400),
        threshold=0.3,
    ).select(
        F.lit("decontam").alias("op"),
        F.col("train_id").cast("long").alias("id_a"),
        F.col("eval_id").cast("long").alias("id_b"),
        F.col("n_common").cast("long").alias("n"),
        F.col("containment").alias("metric"),
    )
    merges = train_bpe(docs, n_merges=_BPE_MERGES)
    bm = merges_table(spark, merges).select(
        F.lit("bpe_merge").alias("op"),
        F.col("merge_rank").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("pair_count").alias("n"),
        F.concat_ws(" ", "left", "right").alias("metric"),
    )
    bd = apply_bpe(docs, merges).select(
        F.lit("bpe_doc").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("n_bpe_tokens").alias("n"),
        F.md5(F.col("bpe_tokens").cast("binary")).alias("metric"),
    )
    from ..operators.export import training_order
    from ..operators.sampling import mix_to_proportions, train_test_split

    ex = training_order(
        docs.select("doc_id"), "doc_id", n_shards=_EXPORT_SHARDS, salt="export"
    ).select(
        F.lit("export").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("shard").cast("long").alias("id_b"),
        F.col("_train_ord").cast("long").alias("n"),
        F.lit("").alias("metric"),
    )
    mixed, fractions = mix_to_proportions(
        docs.select("doc_id", "lang"), "lang", _MIX_WEIGHTS, "doc_id", salt="mix"
    )
    mk = mixed.select(
        F.lit("mix_keep").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.lit(1).cast("long").alias("n"),
        F.col("lang").alias("metric"),
    )
    counts = {
        r["lang"]: r["n"]
        for r in docs.where(F.col("lang").isin(*sorted(_MIX_WEIGHTS)))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    mf = spark.createDataFrame(
        [(s, counts[s], float(f)) for s, f in sorted(fractions.items())],
        "lang string, n long, frac double",
    ).select(
        F.lit("mix_frac").alias("op"),
        F.lit(0).cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("n"),
        F.concat(F.col("lang"), F.lit("="), stable_round6(F.col("frac"))).alias(
            "metric"
        ),
    )
    from ..operators.sampling import temperature_weights

    tw = temperature_weights(docs.select("lang"), "lang", alpha=_TEMP_ALPHA)
    tcounts = {
        r["lang"]: r["n"]
        for r in docs.where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    twf = spark.createDataFrame(
        [(s, tcounts[s], float(w)) for s, w in sorted(tw.items())],
        "lang string, n long, w double",
    ).select(
        F.lit("temp_w").alias("op"),
        F.lit(0).cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("n"),
        F.concat(F.col("lang"), F.lit("="), stable_round6(F.col("w"))).alias(
            "metric"
        ),
    )
    from ..operators.chunking import chunk_documents

    chunks_raw = chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    )
    ck = chunks_raw.select(
        F.lit("chunk").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("chunk_id").cast("long").alias("id_b"),
        F.col("n_tokens").alias("n"),
        F.md5(F.col("chunk").cast("binary")).alias("metric"),
    )
    # FFD packing: the greedy loop itself is partition-local Python
    # (not SQL-expressible), but its INVARIANTS are exact aggregates
    # the oracle recomputes from the chunk stream alone — every chunk
    # packed exactly once (rows == distinct keys == oracle chunk
    # count), token mass conserved, NO multi-doc bin over budget
    # (oracle literal 0), and over-budget chunks isolated as singleton
    # bins (bin-over-budget count == oracle's over-budget chunk count).
    from ..operators.packing import pack_sequences

    packed = pack_sequences(
        chunks_raw.select("doc_id", "chunk_id", "n_tokens"),
        budget=_PACK_BUDGET,
        id_cols=("doc_id", "chunk_id"),
    )
    pack_bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("nd")
    )

    def _pack_row(agg_df: DataFrame, label: str) -> DataFrame:
        return agg_df.select(
            F.lit("pack").alias("op"),
            F.lit(0).cast("long").alias("id_a"),
            F.lit(0).cast("long").alias("id_b"),
            F.col("v").cast("long").alias("n"),
            F.lit(label).alias("metric"),
        )

    pk = (
        _pack_row(packed.agg(F.count("*").alias("v")), "rows")
        .unionByName(
            _pack_row(
                packed.agg(
                    F.count_distinct(F.col("doc_id"), F.col("chunk_id")).alias("v")
                ),
                "distinct_keys",
            )
        )
        .unionByName(
            _pack_row(packed.agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("v")), "token_sum")
        )
        .unionByName(
            _pack_row(
                pack_bins.where(
                    (F.col("nd") >= 2) & (F.col("total") > _PACK_BUDGET)
                ).agg(F.count("*").alias("v")),
                "overfull_multi",
            )
        )
        .unionByName(
            _pack_row(
                pack_bins.where(F.col("total") > _PACK_BUDGET).agg(
                    F.count("*").alias("v")
                ),
                "oversize_bins",
            )
        )
    )
    # content-defined chunking: the hash-only LBFS boundary rule is one
    # declarative projection, so the oracle reproduces every boundary
    # and segment hash bit-for-bit (operators/chunking.py cdc_chunks)
    from ..operators.chunking import cdc_chunks

    cdc_raw = cdc_chunks(docs, window=_CDC_WINDOW, divisor=_CDC_DIVISOR)
    cdc = cdc_raw.select(
        F.lit("cdc").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("chunk_id").cast("long").alias("id_b"),
        F.col("n_tokens").alias("n"),
        F.md5(F.col("chunk").cast("binary")).alias("metric"),
    )
    # the point of content-defined boundaries: cross-document duplicated
    # BLOCKS group on their chunk hash (storage-dedup style) — one
    # 16-byte-key groupBy, never a pairwise comparison
    cdc_dup = (
        cdc_raw.groupBy(F.md5(F.col("chunk").cast("binary")).alias("metric"))
        .agg(
            F.min("doc_id").cast("long").alias("id_a"),
            F.count_distinct("doc_id").cast("long").alias("id_b"),
            F.count("*").cast("long").alias("n"),
        )
        .where(F.col("id_b") > 1)
        .select(
            F.lit("cdc_dup").alias("op"), "id_a", "id_b", "n", "metric"
        )
    )
    # the SCALABLE decomposed-rank forms carry the driver hash check
    # (round 7): row-identical to the plain forms (tests/test_sampling.py
    # proves it for every (k, n_buckets)), so the oracles stand
    # unchanged — but the paths a 100 TB run would use (value-range
    # bucketed rank; bucket-local top-k + bounded merge) are now the
    # ones the driver verifies. n_buckets deliberately non-power-of-2
    # and small enough that buckets really split the sample.
    from ..operators.sampling import (
        priority_sample_scalable,
        quota_sample_scalable,
    )

    pri = priority_sample_scalable(
        docs.select("doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        k=_PRIORITY_K,
        n_buckets=7,
    ).select(
        F.lit("priority").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("rank").alias("id_b"),
        F.col("n_chars").cast("long").alias("n"),
        stable_round6(F.col("priority")).alias("metric"),
    )
    quo = quota_sample_scalable(
        docs.select("doc_id", "lang"), "lang", "doc_id", k=_QUOTA_K, n_buckets=5
    ).select(
        F.lit("quota").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("rank").alias("id_b"),
        F.lit(0).cast("long").alias("n"),
        F.col("lang").alias("metric"),
    )
    # PII scrubbing over a deterministic fixture: the corpus is digit-
    # free word soup, so each doc gets one synthetic email + one IP
    # appended IDENTICALLY in both engines; the md5 of the fully
    # scrubbed text and both counts then cross-verify the email/IP
    # stages (RE2-expressible). The PHONE stage runs too but matches
    # nothing here (its lookaround pattern is not RE2-expressible —
    # phone redaction behavior stays pytest-verified in
    # tests/test_chunking_scrub.py).
    from ..functions.scrub import scrub_counts, scrub_text

    pii_text = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10.0."),
        (F.col("doc_id") / 256).cast("int").cast("string"),
        F.lit("."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" now"),
    )
    sc = docs.select(
        F.lit("scrub").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        scrub_counts(pii_text).getField("n_emails").alias("id_b"),
        scrub_counts(pii_text).getField("n_ips").alias("n"),
        F.md5(scrub_text(pii_text).cast("binary")).alias("metric"),
    )
    # the two composed-pipeline parts: what the STREAMED prep pipeline
    # landed across three deterministic micro-batches (cross-batch
    # near-dup suppression against the committed signature store
    # included), and what the BATCH pipeline landed end to end — both
    # read back from their committed/landed parquet, so the hashes pin
    # the stage COMPOSITION (survivor sets + chunk content), not just
    # the already-verified pieces. bin_id/shard stay out of the hash:
    # bin numbering follows the packer's partition layout; its exact
    # invariants are the 'pack' part's job.
    from ..streaming.pipeline import read_prepared

    ps = read_prepared(spark, _streamed_prep_store(spark, sf_dir, docs)).select(
        F.lit("pipe_streamed").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("chunk_id").cast("long").alias("id_b"),
        F.col("n_tokens").cast("long").alias("n"),
        F.md5(F.col("chunk").cast("binary")).alias("metric"),
    )
    pb = spark.read.parquet(_batch_prep_store(spark, sf_dir, docs)).select(
        F.lit("pipe_batch").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("chunk_id").cast("long").alias("id_b"),
        F.col("n_tokens").cast("long").alias("n"),
        F.md5(F.col("chunk").cast("binary")).alias("metric"),
    )
    tr_side, te_side = train_test_split(
        docs.select("doc_id"), "doc_id", _SPLIT_FRAC, salt="split"
    )
    sp = tr_side.select(
        F.lit("split").alias("op"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.lit(0).cast("long").alias("n"),
        F.lit("train").alias("metric"),
    ).unionByName(
        te_side.select(
            F.lit("split").alias("op"),
            F.col("doc_id").cast("long").alias("id_a"),
            F.lit(0).cast("long").alias("id_b"),
            F.lit(0).cast("long").alias("n"),
            F.lit("test").alias("metric"),
        )
    )
    return (
        sd.unionByName(dc)
        .unionByName(bm)
        .unionByName(bd)
        .unionByName(ex)
        .unionByName(mk)
        .unionByName(mf)
        .unionByName(twf)
        .unionByName(ck)
        .unionByName(pk)
        .unionByName(cdc)
        .unionByName(cdc_dup)
        .unionByName(pri)
        .unionByName(quo)
        .unionByName(sc)
        .unionByName(sp)
        .unionByName(ps)
        .unionByName(pb)
    )


@register(
    "simhash_fingerprints",
    oracle="WITH "
    + TOKS_POS_CTE
    + """,
tok_h AS (
    SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
    FROM tokpos
),
bits AS (
    SELECT doc_id, j,
           CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END AS contrib
    FROM tok_h, unnest(range(0, 32)) AS t(j)
),
per_bit AS (
    SELECT doc_id, j, sum(contrib) AS s FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
""",
    tags=("dedup", "simhash"),
    doc="32-bit SimHash fingerprints (sign-aggregated token hashes).",
)
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_fingerprints(_docs(spark, sf_dir))


@register(
    "simhash_near_dups",
    oracle="WITH "
    + TOKS_POS_CTE
    + """,
tok_h AS (
    SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
    FROM tokpos
),
bits AS (
    SELECT doc_id, j,
           CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END AS contrib
    FROM tok_h, unnest(range(0, 32)) AS t(j)
),
per_bit AS (
    SELECT doc_id, j, sum(contrib) AS s FROM bits GROUP BY doc_id, j
),
fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM per_bit GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
    tags=("dedup", "simhash"),
    doc="SimHash near-dup pairs: Hamming distance <= 6 over 32 bits. The "
    "engine uses pigeonhole banding (7 bit-blocks, equi-join on any "
    "equal block, verify bit_count(xor)) — the oracle stays the naive "
    "all-pairs formulation, proving the banding drops no pair.",
)
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_near_dups(_docs(spark, sf_dir), max_hamming=6)


@register(
    "ngram_jaccard_block",
    oracle="WITH "
    + SHINGLES_CTE
    + """,
blocked AS (SELECT * FROM shingles WHERE doc_id < 60),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM blocked GROUP BY doc_id),
inter AS (
    SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_common
    FROM blocked sa JOIN blocked sb
      ON sa.shingle_hash = sb.shingle_hash AND sa.doc_id < sb.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(CAST(round(CAST(i.n_common * 1.0 / (za.n_sh + zb.n_sh - i.n_common) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE i.n_common * 1.0 / (za.n_sh + zb.n_sh - i.n_common) >= 0.02
""",
    tags=("dedup",),
    doc="Blocked all-pairs n-gram Jaccard (shingle-join, no explicit cross).",
)
def q_ngram_jaccard_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = dd.shingles(_docs(spark, sf_dir)).where(F.col("doc_id") < 60)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle_hash")
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle_hash").alias("hb"))
    inter = (
        sa.join(sb, (F.col("shingle_hash") == F.col("hb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .where(jac >= 0.02)
        .select("doc_a", "doc_b", stable_round6(jac).alias("jaccard"))
    )
