"""Temporal join shapes the reference lacks entirely (SURVEY.md §2.1):
as-of join and range self-join, plus approximate aggregates built as
deterministic threshold sketches so even "approximate" answers are
hash-verified across engines (Spark-native HLL/KLL sketches, whose
internals legitimately differ per engine, are accuracy-bound-tested in
tests/test_approx_sketches.py instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import sql_stable_hash32, sql_stable_hash48
from ..sources.tables import load_table
from .exprs import sql_stable_round6
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "asof_latest_order",
    oracle="""
WITH pairs AS (
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey, o.o_orderdate,
           row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
           ) AS rn
    FROM events e
    JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    WHERE e.event_id < 2000
)
SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
       o_orderdate AS last_orderdate
FROM pairs WHERE rn = 1
""",
    tags=("relational", "join", "asof"),
    doc="As-of join: each event matched to the user's latest order at or "
    "before the event time (window-deduped inequality join).",
)
def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        e.join(
            o,
            (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
    )


@register(
    "range_join_event_bursts",
    oracle="""
SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
    tags=("relational", "join", "range"),
    doc="Range self-join: pairs of same-user events within a 5-minute "
    "burst window (equi key + bounded interval predicate).",
)
def q_range_join_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("event_a"), "user_id", F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            "event_a",
            "event_b",
            "user_id",
            (
                F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")
            ).alias("gap_sec"),
        )
    )


# Threshold-sketch parameters: value-hash below 2^32/64 -> the sketch
# keeps ~1/64 of DISTINCT values; row-hash below 2^32/16 -> ~1/16 of
# rows feed the sampled percentile. Powers of two keep the estimator
# scale-up an exact integer multiply.
_KMV_T = 67_108_864  # 2^32 / 64
_SAMPLE_T = 268_435_456  # 2^32 / 16


_HP = sql_stable_hash32("CAST(l_partkey AS VARCHAR)")
# HLL uses the WIDER 48-bit hash (functions/hashing.py stable_hash48):
# 32 bits collide materially above ~10^8 distinct keys, and the whole
# point of a distinct sketch at 100 TB is 10^9+ keys. KMV DELIBERATELY
# stays 32-bit: its keep probability IS _KMV_T / 2^32 (= 1/64), so
# "widening the hash" without re-deriving _KMV_T from the new space
# would silently collapse the keep rate to ~0 and the estimate to 0.
# Calibrated envelope: collision undercount (~n/2^33) stays below the
# sampler's own noise (RSE ~ 8/sqrt(n)) up to n ~ 2^24 distinct keys,
# and stays under 1% absolute to n ~ 10^8 — the right trade for a
# fixed-rate sample whose job is also feeding the sampled percentile;
# unbounded-cardinality estimation is HLL's job, not KMV's.
_HP48 = sql_stable_hash48("CAST(l_partkey AS VARCHAR)")
_HO = sql_stable_hash32("CAST(l_orderkey AS VARCHAR)")
_HR = sql_stable_hash32("l_orderkey || '-' || l_linenumber")
_SAMPLED = f"CASE WHEN {_HR} < {_SAMPLE_T} THEN l_extendedprice END"

# Count-min / heavy-hitter parameters for the 'cms' and 'heavy' parts:
# probes include a guaranteed-absent word (its CMS estimate is whatever
# collisions put in its slots — the oracle reproduces it exactly) and
# k=50 puts ~30 words over the N/k exact-verification threshold on the
# synthetic corpus.
_CMS_PROBES = ("join", "hash", "customer", "nosuchwordxyz")
_HH_K = 50


@register(
    "approx_aggregates",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word
    FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
          FROM documents)
    WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
),
base AS (
    SELECT CAST(64 * COUNT(DISTINCT CASE WHEN {_HP} < {_KMV_T} THEN l_partkey END) AS BIGINT) AS est_parts,
           CAST(64 * COUNT(DISTINCT CASE WHEN {_HO} < {_KMV_T} THEN l_orderkey END) AS BIGINT) AS est_orders,
           {sql_stable_round6(f"quantile_cont({_SAMPLED}, 0.5)")} AS median_price,
           {sql_stable_round6(f"quantile_cont({_SAMPLED}, 0.95)")} AS p95_price
    FROM lineitem
),
coords AS (
    SELECT seed,
           CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '_' || word), 1, 8) AS BIGINT) % 256 AS slot
    FROM toks, unnest([0, 1, 2, 3]) AS s(seed)
),
cms AS (SELECT seed, slot, count(*) AS c FROM coords GROUP BY seed, slot),
probes(word) AS (VALUES {", ".join(f"('{w}')" for w in _CMS_PROBES)}),
pcoords AS (
    SELECT word, seed,
           CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '_' || word), 1, 8) AS BIGINT) % 256 AS slot
    FROM probes, unnest([0, 1, 2, 3]) AS s(seed)
),
est AS (
    SELECT p.word, min(coalesce(c.c, 0)) AS est
    FROM pcoords p LEFT JOIN cms c ON c.seed = p.seed AND c.slot = p.slot
    GROUP BY p.word
),
ntok AS (SELECT count(*) AS n FROM toks),
hh AS (
    SELECT word, count(*) AS n FROM toks GROUP BY word
    HAVING count(*) > (SELECT n FROM ntok) / {_HH_K}.0
),
dlr AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
rawq AS (
    SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ) WHERE tok <> ''
),
qsc AS (
    SELECT doc_id,
           CAST(round(CAST(
               0.4 * (sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                          THEN 1 ELSE 0 END) * 1.0 / count(*))
             + 0.3 * least(sum(length(tok)) * 1.0 / count(*) / 10.0, 1.0)
             + 0.3 * least(count(*) * 1.0 / 100.0, 1.0)
           AS DECIMAL(28,12)), 6) AS DECIMAL(18,6)) AS q
    FROM rawq GROUP BY doc_id
),
newdocs AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT -(doc_id + 1) AS doc_id, text FROM documents WHERE doc_id % 11 = 0
),
oldh AS (SELECT doc_id, md5(text) AS old_hash FROM documents),
newh AS (SELECT doc_id, md5(text) AS new_hash FROM newdocs),
cdiff AS (
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.old_hash IS NOT DISTINCT FROM n.new_hash THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_hash, n.new_hash
    FROM oldh o FULL OUTER JOIN newh n ON n.doc_id = o.doc_id
),
umerged AS (
    SELECT d.doc_id, d.text FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM newdocs n WHERE n.doc_id = d.doc_id)
    UNION ALL
    SELECT doc_id, text FROM newdocs
),
hllr AS (
    SELECT CAST(({_HP48}) % 64 AS INT) AS register,
           MAX(CASE WHEN ({_HP48}) // 64 > 0
                    THEN 43 - length(bin(({_HP48}) // 64))
                    ELSE 43 END) AS max_rho
    FROM lineitem GROUP BY 1
),
hlle AS (
    SELECT SUM(pow(2.0, -max_rho)) + (64 - count(*)) AS s,
           64 - count(*) AS v
    FROM hllr
),
ustats AS (
    SELECT
      (SELECT count(*) FROM documents d
       WHERE EXISTS (SELECT 1 FROM newdocs n WHERE n.doc_id = d.doc_id))
          AS n_updated,
      (SELECT count(*) FROM (SELECT DISTINCT doc_id FROM newdocs) n
       WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = n.doc_id))
          AS n_inserted,
      (SELECT count(*) FROM documents d
       WHERE NOT EXISTS (SELECT 1 FROM newdocs n WHERE n.doc_id = d.doc_id))
          AS n_unchanged
)
SELECT 'kmv' AS part, 'est_parts' AS metric, CAST(est_parts AS VARCHAR) AS value FROM base
UNION ALL SELECT 'kmv', 'est_orders', CAST(est_orders AS VARCHAR) FROM base
UNION ALL SELECT 'sample', 'median_price', median_price FROM base
UNION ALL SELECT 'sample', 'p95_price', p95_price FROM base
UNION ALL SELECT 'cms', word, CAST(est AS VARCHAR) FROM est
UNION ALL SELECT 'heavy', word, CAST(n AS VARCHAR) FROM hh
UNION ALL SELECT 'report', 'n_docs', CAST(count(*) AS VARCHAR) FROM documents
UNION ALL SELECT 'report', 'n_tokens', CAST(count(*) AS VARCHAR) FROM toks
UNION ALL SELECT 'report', 'n_distinct_words',
       CAST(count(DISTINCT word) AS VARCHAR) FROM toks
UNION ALL SELECT 'report', 'exact_dup_docs',
       CAST(coalesce(sum(n - 1), 0) AS VARCHAR)
FROM (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY h)
UNION ALL SELECT 'report', 'len_p25', CAST(quantile_disc(dl, 0.25) AS VARCHAR) FROM dlr
UNION ALL SELECT 'report', 'len_p50', CAST(quantile_disc(dl, 0.50) AS VARCHAR) FROM dlr
UNION ALL SELECT 'report', 'len_p75', CAST(quantile_disc(dl, 0.75) AS VARCHAR) FROM dlr
UNION ALL SELECT 'report', 'len_p95', CAST(quantile_disc(dl, 0.95) AS VARCHAR) FROM dlr
UNION ALL SELECT 'report', 'quality_p50', CAST(quantile_disc(q, 0.5) AS VARCHAR) FROM qsc
UNION ALL SELECT 'report', 'lang=' || lang, CAST(count(*) AS VARCHAR)
FROM documents GROUP BY lang
UNION ALL SELECT 'report', 'source=' || source, CAST(count(*) AS VARCHAR)
FROM documents GROUP BY source
UNION ALL SELECT 'check', 'null_doc_id',
       CAST(count(CASE WHEN doc_id IS NULL THEN 1 END) AS VARCHAR) FROM documents
UNION ALL SELECT 'check', 'null_text',
       CAST(count(CASE WHEN text IS NULL THEN 1 END) AS VARCHAR) FROM documents
UNION ALL SELECT 'check', 'empty_text',
       CAST(count(CASE WHEN text IS NOT NULL
            AND regexp_replace(text, '\\s+', '', 'g') = '' THEN 1 END) AS VARCHAR)
FROM documents
UNION ALL SELECT 'check', 'oversize_text',
       CAST(count(CASE WHEN length(text) > 1000000 THEN 1 END) AS VARCHAR)
FROM documents
UNION ALL SELECT 'check', 'duplicate_doc_id',
       CAST(coalesce(sum(n - 1), 0) AS VARCHAR)
FROM (SELECT doc_id, count(*) AS n FROM documents GROUP BY doc_id)
UNION ALL SELECT 'diff', CAST(doc_id AS VARCHAR),
       status || ':' || coalesce(old_hash, '') || ':' || coalesce(new_hash, '')
FROM cdiff
UNION ALL SELECT 'upsert', CAST(doc_id AS VARCHAR), coalesce(md5(text), '')
FROM umerged
UNION ALL SELECT 'upsert_stats', 'counts',
       CAST(n_updated AS VARCHAR) || ':' || CAST(n_inserted AS VARCHAR)
       || ':' || CAST(n_unchanged AS VARCHAR)
FROM ustats
UNION ALL SELECT 'hll', 'reg_' || CAST(register AS VARCHAR),
       CAST(max_rho AS VARCHAR)
FROM hllr
UNION ALL SELECT 'hll', 'estimate',
       {sql_stable_round6(
           "CASE WHEN 0.709 * 4096 / s <= 160 AND v > 0 "
           "THEN round(ln(64.0 / v), 9) * 64 "
           "ELSE 0.709 * 4096 / s END"
       )}
FROM hlle
""",
    tags=("relational", "agg", "approx", "sketch"),
    doc="The DETERMINISTIC approximate-aggregate family, hash-verified "
    "across engines as labeled (part, metric, value) rows. 'kmv': "
    "threshold-KMV distinct estimates over lineitem (count distinct "
    "values whose md5-hash falls under 1/64 of hash space, scaled back "
    "up). 'sample': exact percentiles over a deterministic 1/16 row "
    "sample. 'cms': count-min sketch estimates (operators/sketches.py "
    "cms_build/cms_estimate — d=4 x w=256 md5-slotted counters, ONE "
    "corpus scan, probes join the bounded counter table, never the "
    "corpus; the probe set includes an absent word whose "
    "collision-floor estimate the oracle reproduces exactly). 'heavy': "
    "every term with global count > N/50 with its EXACT count "
    "(frequent_terms — per-partition vectorized Misra-Gries summaries, "
    "candidates exact-verified via semi-join; the oracle is the plain "
    "full-vocabulary groupBy the MG pass avoids, so a hash match "
    "proves the sketch path loses nothing). 'hll': the engine's OWN "
    "deterministic HyperLogLog (sketches.py hll_register_table / "
    "hll_estimate, Flajolet et al. 2007) over the same l_partkey the "
    "KMV part estimates — md5-hashed, so all 64 integer registers are "
    "hash-verified individually, and the harmonic-sum estimate is "
    "exact dyadic arithmetic (sum of 2^-rho terms is order-independent "
    "in IEEE doubles) rendered round-6; build = ONE 64-row groupBy "
    "whatever the input size, merge = element-wise max. Spark's native "
    "approx_count_distinct/percentile_approx (HLL++/KLL internals, "
    "engine-specific) stay accuracy-bound-tested in "
    "tests/test_approx_sketches.py; every part HERE is reproducible "
    "bit-for-bit on any engine with md5. "
    "'report'/'check'/'diff' parts driver-verify the corpus-audit "
    "family a pipeline runs before committing compute: corpus_report "
    "(operators/report.py — doc/token/vocab counts, exact-dup count, "
    "token-length quantiles and the disc-median quality score via the "
    "EXACT value-domain cumulative pass (report.py disc_quantiles — "
    "one groupBy to distinct values, then ceil(p*n) picks over that "
    "bounded frame; replaced percentile_approx in round 8 after the "
    "sf1 spot-check caught its 10k-row accuracy envelope drifting the "
    "quality median at 50k docs), per-lang and per-source shares; the "
    "oracle's quantile_disc implements the same ceil(p*n) rule), "
    "corpus_checks (report.py — the five data-quality gates as ONE "
    "conditional-count aggregation + the duplicate-id groupBy), and "
    "corpus_diff (operators/maintenance.py — added/removed/changed/"
    "unchanged between the corpus and a deterministically perturbed "
    "v2, presence from join-side markers so null content still reads "
    "as present; only 16-byte hashes shuffle through the full-outer "
    "join, never texts). 'upsert'/'upsert_stats' parts driver-verify "
    "the SCD1 keyed merge (maintenance.py merge_upsert: anti-join + "
    "union, updates win on key collision — the same v2 batch as the "
    "diff, so all three collision classes occur) and its audit counts "
    "(upsert_stats: updated/inserted/unchanged via semi/anti joins), "
    "against an EXISTS-based oracle twin. "
    "Scale shape: one filtered distinct-count, one filtered "
    "percentile, one token-stream explode into d*w counter rows, and "
    "a candidates-only exact count — no full-vocabulary shuffle "
    "anywhere; the audit family is aggregation-shaped (a few dozen "
    "output rows whatever the corpus size) plus one key-only "
    "full-outer join.",
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import stable_hash32
    from ..operators import sketches as sk
    from ..operators.maintenance import corpus_diff
    from ..operators.report import corpus_checks, corpus_report
    from .exprs import stable_round6

    l = _t(spark, sf_dir, "lineitem")
    docs = _t(spark, sf_dir, "documents")
    hpart = stable_hash32(F.col("l_partkey").cast("string"))
    hord = stable_hash32(F.col("l_orderkey").cast("string"))
    hrow = stable_hash32(F.concat_ws("-", "l_orderkey", "l_linenumber"))
    sampled_price = F.when(hrow < _SAMPLE_T, F.col("l_extendedprice"))
    one = l.agg(
        (F.countDistinct(F.when(hpart < _KMV_T, F.col("l_partkey"))) * 64)
        .cast("long")
        .cast("string")
        .alias("est_parts"),
        (F.countDistinct(F.when(hord < _KMV_T, F.col("l_orderkey"))) * 64)
        .cast("long")
        .cast("string")
        .alias("est_orders"),
        stable_round6(F.percentile(sampled_price, 0.5)).alias("median_price"),
        stable_round6(F.percentile(sampled_price, 0.95)).alias("p95_price"),
    )
    kmv_sample = one.unpivot([], one.columns, "metric", "value").select(
        F.when(F.col("metric").isin("est_parts", "est_orders"), "kmv")
        .otherwise("sample")
        .alias("part"),
        "metric",
        "value",
    )
    cms = sk.cms_estimate(sk.cms_build(docs), list(_CMS_PROBES)).select(
        F.lit("cms").alias("part"),
        F.col("word").alias("metric"),
        F.col("est").cast("string").alias("value"),
    )
    heavy = sk.frequent_terms(docs, k=_HH_K).select(
        F.lit("heavy").alias("part"),
        F.col("word").alias("metric"),
        F.col("n").cast("string").alias("value"),
    )
    rep = corpus_report(docs).select(
        F.lit("report").alias("part"), "metric", "value"
    )
    chk = corpus_checks(docs).select(
        F.lit("check").alias("part"),
        F.col("check").alias("metric"),
        F.col("n_violations").alias("value"),
    )
    # corpus v2: a deterministic perturbation of the same table —
    # removals (id % 7), content changes (id % 5), additions (id % 11
    # re-keyed to -(id+1)) — so the diff exercises all four statuses
    # with an exact SQL twin. The NEGATED re-key keeps added ids
    # disjoint from the corpus at ANY scale (testdata ids are dense
    # non-negative): a fixed literal offset (+100000 before round 9)
    # silently collided once the corpus outgrew it, handing the SCD1
    # merge a duplicate-keyed source — ill-defined audit counts, caught
    # by the sf10 sweep (Spark counted source rows with a match,
    # the EXISTS oracle counted target rows with a match).
    changed = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    new_docs = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select("doc_id", changed.alias("text"))
        .unionByName(
            docs.where(F.col("doc_id") % 11 == 0).select(
                (-(F.col("doc_id") + 1)).alias("doc_id"), "text"
            )
        )
    )
    dif = corpus_diff(docs.select("doc_id", "text"), new_docs).select(
        F.lit("diff").alias("part"),
        F.col("doc_id").cast("string").alias("metric"),
        F.concat_ws(
            ":",
            "status",
            F.coalesce(F.col("old_hash"), F.lit("")),
            F.coalesce(F.col("new_hash"), F.lit("")),
        ).alias("value"),
    )
    # the same v2 batch drives the SCD1 upsert: the merged snapshot
    # (anti-join + union) and its audit counts, each with an exact twin
    from ..operators.maintenance import merge_upsert, upsert_stats

    ups = merge_upsert(docs.select("doc_id", "text"), new_docs, "doc_id").select(
        F.lit("upsert").alias("part"),
        F.col("doc_id").cast("string").alias("metric"),
        F.coalesce(F.md5(F.col("text").cast("binary")), F.lit("")).alias(
            "value"
        ),
    )
    ust = upsert_stats(
        docs.select("doc_id"), new_docs.select("doc_id"), "doc_id"
    ).select(
        F.lit("upsert_stats").alias("part"),
        F.lit("counts").alias("metric"),
        F.concat_ws(":", "n_updated", "n_inserted", "n_unchanged").alias(
            "value"
        ),
    )
    # deterministic HLL over the same key KMV estimates — the two
    # standard distinct sketches side by side on one column; the 64
    # integer registers are hash-verified individually and the
    # harmonic-sum estimate is exact dyadic arithmetic (see
    # sketches.hll_estimate)
    hll_regs = sk.hll_register_table(l, F.col("l_partkey").cast("string"))
    hll_reg_rows = hll_regs.select(
        F.lit("hll").alias("part"),
        F.concat(F.lit("reg_"), F.col("register").cast("string")).alias(
            "metric"
        ),
        F.col("max_rho").cast("string").alias("value"),
    )
    hll_est = sk.hll_estimate(hll_regs).select(
        F.lit("hll").alias("part"),
        F.lit("estimate").alias("metric"),
        stable_round6(F.col("estimate")).alias("value"),
    )
    return (
        kmv_sample.unionByName(cms)
        .unionByName(heavy)
        .unionByName(rep)
        .unionByName(chk)
        .unionByName(dif)
        .unionByName(ups)
        .unionByName(ust)
        .unionByName(hll_reg_rows)
        .unionByName(hll_est)
    )


@register(
    "skew_salted_sum",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(round(l_quantity, 6) AS DECIMAL(38,8))) AS VARCHAR)
           AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "agg", "skew"),
    doc="Two-phase salted aggregation (operators/skew.py): hot keys fan "
    "out over 16 salted reducers, partials merge per key — result "
    "identical to the plain plan, proven through the oracle.",
)
def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_sum

    l = _t(spark, sf_dir, "lineitem")
    return salted_sum(
        l,
        "l_returnflag",
        F.round("l_quantity", 6).cast("decimal(38,8)"),
        "sum_qty",
    ).withColumn("sum_qty", F.col("sum_qty").cast("string"))


# props_map_explode, datetime_format_functions and regexp_functions were
# folded into json_map_functions / date_functions / string_functions in
# queries_relational.py — same operators, one registry slot per family.


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(value, 6) AS value
FROM (
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_linenumber = 1
)
""",
    tags=("relational", "reshape"),
    doc="Unpivot/melt: wide measure columns to long (measure, value) rows.",
)
def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        F.round("value", 6).alias("value"),
    )


# window_value_functions was folded into queries_relational.py's
# window_navigation (one deterministic per-customer window serves the
# whole analytic family).
