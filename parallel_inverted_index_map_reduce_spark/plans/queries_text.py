"""Text-analysis + multimodal query specs (SURVEY.md §7 Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from ..operators import textstats as ts
from ..sources.tables import load_table
from .exprs import sql_stable_round6
from .queries_dedup import TOKS_POS_CTE
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "text_quality",
    oracle="WITH "
    + TOKS_POS_CTE
    + """
, agg AS (
SELECT doc_id, count(*) AS n_tokens,
       count(DISTINCT tok) AS n_distinct_tokens,
       CAST(CAST(round(CAST(sum(length(tok)) * 1.0 / count(*) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS avg_token_len,
       CAST(CAST(round(CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                 THEN 1 ELSE 0 END) * 1.0 / count(*) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS stopword_ratio,
       CAST(CAST(round(CAST(0.4 * (sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                        THEN 1 ELSE 0 END) * 1.0 / count(*))
           + 0.3 * least(sum(length(tok)) * 1.0 / count(*) / 10.0, 1.0)
           + 0.3 * least(count(*) * 1.0 / 100.0, 1.0) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS quality_score
FROM tokpos GROUP BY doc_id
)
, g2 AS (
    SELECT doc_id, g FROM (
        SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w AS g
        FROM tokpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE g IS NOT NULL
), g3 AS (
    SELECT doc_id, g FROM (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g
        FROM tokpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE g IS NOT NULL
), g5 AS (
    SELECT doc_id, g FROM (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                   || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS g
        FROM tokpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE g IS NOT NULL
), c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
t2 AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS f FROM c2 GROUP BY doc_id),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
t3 AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS f FROM c3 GROUP BY doc_id),
t5 AS (SELECT doc_id,
              (count(*) - count(DISTINCT g)) * 1.0 / count(*) AS f
       FROM g5 GROUP BY doc_id),
runs AS (
    -- gaps-and-islands over the DENSE post-filter rank, not the raw
    -- split position: dropping an empty token (consecutive whitespace)
    -- leaves a gap in pos, and the engine's array fold treats the
    -- survivors as adjacent — "x  x" is a run of 2. Raw-pos arithmetic
    -- here silently split such runs; caught by the round-8 sf1
    -- spot-check (chimera docs splice mid-whitespace), invisible at
    -- sf0.01 because the fixture has no consecutive whitespace. Every
    -- other part of this oracle already uses lead() over the filtered
    -- rows, which is gap-immune by construction.
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp
    FROM tokpos
), rl AS (SELECT doc_id, count(*) AS n FROM runs GROUP BY doc_id, tok, grp),
mr AS (SELECT doc_id, max(n) AS max_token_run FROM rl GROUP BY doc_id),
bg AS (
    SELECT doc_id, tok AS a, lead(tok, 1) OVER w AS b
    FROM tokpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), bg2 AS (SELECT doc_id, a, b FROM bg WHERE b IS NOT NULL),
bpc AS (SELECT a, b, count(*) AS c_ab FROM bg2 GROUP BY a, b),
bhc AS (SELECT a, count(*) AS c_head FROM bg2 GROUP BY a),
blm AS (
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(round(CAST(
               CAST(SUM(CAST(round(ln(CAST(p.c_ab AS DOUBLE)
                                     / CAST(h.c_head AS DOUBLE)), 9)
                        AS DECIMAL(28,12))) AS DOUBLE) / count(*)
               AS DECIMAL(28,12)), 6) AS DECIMAL(18,6)) AS VARCHAR)
               AS avg_logprob
    FROM bg2 g JOIN bpc p ON p.a = g.a AND p.b = g.b
    JOIN bhc h ON h.a = g.a
    GROUP BY g.doc_id
),
feats AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS bucket
    FROM tokpos
    UNION ALL
    SELECT doc_id,
           CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 1024 AS bucket
    FROM g2
),
tfeats AS (
    SELECT f.bucket FROM feats f
    JOIN documents d ON d.doc_id = f.doc_id WHERE d.source = 'src0'
),
stot AS (SELECT count(*) + 1024 AS n FROM feats),
ttot AS (SELECT count(*) + 1024 AS n FROM tfeats),
scnt AS (SELECT bucket, count(*) AS cs FROM feats GROUP BY bucket),
tcnt AS (SELECT bucket, count(*) AS ct FROM tfeats GROUP BY bucket),
ratio AS (
    SELECT s.bucket,
           round(ln((CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                     / CAST(s.cs + 1 AS DOUBLE))
                    * (CAST(st.n AS DOUBLE) / CAST(tt.n AS DOUBLE))), 9) AS lr
    FROM scnt s LEFT JOIN tcnt t ON t.bucket = s.bucket, stot st, ttot tt
),
dsir AS (
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           CAST(CAST(round(CAST(SUM(CAST(r.lr AS DECIMAL(28,12)))
                AS DECIMAL(28,12)), 6) AS DECIMAL(18,6)) AS VARCHAR) AS dsir_w
    FROM feats f JOIN ratio r ON r.bucket = f.bucket
    GROUP BY f.doc_id
)
SELECT a.*,
       CAST(len(regexp_extract_all(d.text,
            '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
            AS BIGINT) AS n_bpeish_tokens,
       CAST(CAST(round(CAST(COALESCE(t2.f, 0.0) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS top2_frac,
       CAST(CAST(round(CAST(COALESCE(t3.f, 0.0) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS top3_frac,
       CAST(CAST(round(CAST(COALESCE(t5.f, 0.0) AS DECIMAL(28,12)), 6)
            AS DECIMAL(18,6)) AS VARCHAR) AS dup5_frac,
       CAST(mr.max_token_run AS BIGINT) AS max_token_run,
       CAST(COALESCE(blm.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       COALESCE(blm.avg_logprob, '') AS avg_logprob,
       CAST(COALESCE(ds.n_feats, 0) AS BIGINT) AS n_feats,
       COALESCE(ds.dsir_w, '') AS dsir_w
FROM agg a
JOIN documents d ON d.doc_id = a.doc_id
LEFT JOIN t2 ON t2.doc_id = a.doc_id
LEFT JOIN t3 ON t3.doc_id = a.doc_id
LEFT JOIN t5 ON t5.doc_id = a.doc_id
JOIN mr ON mr.doc_id = a.doc_id
LEFT JOIN blm ON blm.doc_id = a.doc_id
LEFT JOIN dsir ds ON ds.doc_id = a.doc_id
""",
    tags=("text",),
    doc="Token counting + heuristic quality scoring in ONE aggregation "
    "per document: n_tokens, distinct tokens, average token length, "
    "stopword ratio, combined quality score, plus the BPE-ish "
    "pretokenizer token count (second counting mode) per row — and the "
    "Gopher-style repetition filters (top-2/3-gram fraction, duplicate "
    "5-gram fraction, longest back-to-back token run), computed Spark-"
    "side as zero-shuffle per-row array folds while the oracle uses the "
    "windowed lead / gaps-and-islands formulation, proving equivalence "
    "— plus the corpus-bigram LANGUAGE-MODEL score (textstats.py "
    "bigram_lm_scores, the CCNet-lineage LM quality filter): per-doc "
    "average log P(b|a) under the corpus's own bigram model, round-9 "
    "ln over exact integer count ratios and a decimal-summed average "
    "so the value hash-matches cross-engine; docs with <2 tokens carry "
    "n_bigrams=0 and an empty score — plus DSIR importance weights "
    "(textstats.py dsir_importance_weights, Xie et al. 2023): per-doc "
    "log p_target/p_source under hashed unigram+bigram feature models "
    "(1024 md5-hashed buckets, add-1 smoothing, target = the src0 "
    "domain), the data-selection score for tilting a corpus toward a "
    "target domain; the feature space is fixed-size so the model is "
    "two aggregations + a broadcast ratio join, and every term is a "
    "round-9 ln over exact integer counts the oracle reproduces "
    "bit-for-bit (n_feats / dsir_w columns).",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    base = ts.quality_scores(docs).join(ts.repetition_stats(docs), "doc_id")
    dsir = ts.dsir_importance_weights(
        docs, docs.where(F.col("source") == "src0"), n_buckets=1024
    )
    return (
        base.join(ts.bigram_lm_scores(docs), "doc_id", "left")
        .withColumn(
            "n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
        )
        .withColumn("avg_logprob", F.coalesce(F.col("avg_logprob"), F.lit("")))
        .join(dsir, "doc_id", "left")
        .withColumn(
            "n_feats", F.coalesce(F.col("n_feats"), F.lit(0)).cast("long")
        )
        .withColumn("dsir_w", F.coalesce(F.col("dsir_w"), F.lit("")))
    )


@register(
    "language_guess",
    oracle="WITH "
    + TOKS_POS_CTE
    + """,
hits AS (
    SELECT doc_id,
           sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
               THEN 1 ELSE 0 END) AS en_hits,
           sum(CASE WHEN tok IN ('el','la','de','los','y','en','es')
               THEN 1 ELSE 0 END) AS es_hits
    FROM tokpos GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(h.en_hits, 0) AS BIGINT) AS en_hits,
       CAST(COALESCE(h.es_hits, 0) AS BIGINT) AS es_hits,
       CASE WHEN COALESCE(h.en_hits, 0) > COALESCE(h.es_hits, 0) THEN 'en'
            WHEN COALESCE(h.es_hits, 0) > COALESCE(h.en_hits, 0) THEN 'es'
            ELSE 'und' END AS lang_guess,
       (CASE WHEN COALESCE(h.en_hits, 0) > COALESCE(h.es_hits, 0) THEN 'en'
             WHEN COALESCE(h.es_hits, 0) > COALESCE(h.en_hits, 0) THEN 'es'
             ELSE 'und' END) = d.lang AS agrees
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
    tags=("text",),
    doc="Stopword-marker language ID vs the labeled lang column.",
)
def q_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.language_guess(_docs(spark, sf_dir))


_PMI_WINDOW = 3
_PMI_MIN_COUNT = 2


@register(
    "doc_fingerprints",
    oracle="WITH "
    + TOKS_POS_CTE
    + rf"""
, ntk AS (
    SELECT doc_id, word,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS npos
    FROM (
        SELECT doc_id,
               regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word, pos
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok,
                   unnest(range(0, len(string_split_regex(text, '\s+')))) AS pos
            FROM documents
        )
        WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
    )
),
apairs AS (
    SELECT least(a.word, b.word) AS word_a, greatest(a.word, b.word) AS word_b
    FROM ntk a JOIN ntk b
      ON b.doc_id = a.doc_id
     AND b.npos BETWEEN a.npos + 1 AND a.npos + {_PMI_WINDOW}
    WHERE a.word <> b.word
),
tt AS (SELECT count(*) AS t FROM ntk),
pt AS (SELECT count(*) AS p FROM apairs),
un AS (SELECT word, count(*) AS n FROM ntk GROUP BY word),
grp AS (
    SELECT word_a, word_b, count(*) AS n_pair
    FROM apairs GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_COUNT}
),
pmis AS (
    SELECT g.word_a, g.word_b, g.n_pair,
           {sql_stable_round6(
               "round(ln(((CAST(g.n_pair AS DOUBLE) * CAST(tt.t AS DOUBLE))"
               " * CAST(tt.t AS DOUBLE))"
               " / ((CAST(pt.p AS DOUBLE) * CAST(ua.n AS DOUBLE))"
               " * CAST(ub.n AS DOUBLE))), 9)"
           )} AS pmi
    FROM grp g
    CROSS JOIN tt CROSS JOIN pt
    JOIN un ua ON ua.word = g.word_a
    JOIN un ub ON ub.word = g.word_b
)
SELECT 'fp' AS op, CAST(doc_id AS VARCHAR) AS key_a, '' AS key_b,
       CAST(sum((pos + 1) * (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
                             % 1000003)) % 1000000007 AS BIGINT) AS n,
       '' AS metric
FROM tokpos GROUP BY doc_id
UNION ALL
SELECT 'pmi', word_a, word_b, CAST(n_pair AS BIGINT), pmi FROM pmis
""",
    tags=("text", "collocations"),
    doc="Document/corpus text fingerprinting in one labeled result: "
    "'fp' rows are the position-weighted rolling-hash document "
    "fingerprint (order-sensitive yet a plain aggregate), 'pmi' rows "
    "are collocation mining by pointwise mutual information "
    "(operators/textstats.py collocations_pmi, Church & Hanks 1990) "
    "over 3-token co-occurrence windows with min support 2 — pair "
    "generation is one composite (doc_id, position) equi-join (each "
    "token explodes into its following window positions), never a "
    "per-document cross join, and the PMI value is a fixed "
    "parenthesization of integer-ratio double ops + round-9 ln, so "
    "the oracle reproduces it bit-for-bit.",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    fp = ts.doc_fingerprints(docs).select(
        F.lit("fp").alias("op"),
        F.col("doc_id").cast("string").alias("key_a"),
        F.lit("").alias("key_b"),
        F.col("fingerprint").cast("long").alias("n"),
        F.lit("").alias("metric"),
    )
    pmi = ts.collocations_pmi(
        docs, window=_PMI_WINDOW, min_count=_PMI_MIN_COUNT
    ).select(
        F.lit("pmi").alias("op"),
        F.col("word_a").alias("key_a"),
        F.col("word_b").alias("key_b"),
        F.col("n_pair").cast("long").alias("n"),
        F.col("pmi").alias("metric"),
    )
    return fp.unionByName(pmi)


@register(
    "multimodal_features",
    oracle="""
WITH tx AS (
    SELECT doc_id, coalesce(text, '') AS t FROM documents
),
plane AS (
    SELECT doc_id,
           rpad(substr(t, 1, 144), 144, 'x') AS px
    FROM tx
)
SELECT d.doc_id,
       CAST(octet_length(encode(d.t)) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN length(d.t) > 0 THEN ascii(substr(d.t, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte,
       CAST(CASE WHEN length(d.t) > 0 THEN ascii(substr(d.t, length(d.t), 1)) ELSE -1 END AS BIGINT) AS last_byte,
       CAST(coalesce(list_aggregate(list_transform(range(1, length(d.t) + 1),
                           i -> ascii(substr(d.t, i, 1))), 'sum'), 0) AS BIGINT) AS byte_sum,
       CAST(8 AS BIGINT) AS width,
       CAST(6 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(255 AS BIGINT) AS maxval,
       CAST(list_aggregate(list_transform(range(1, 145),
                           i -> ascii(substr(p.px, i, 1))), 'sum') AS BIGINT) AS pixel_sum,
       CAST(144 AS BIGINT) AS n_pixel_bytes,
       CAST(8 * (1 + d.doc_id % 2) AS BIGINT) AS jpeg_width,
       CAST(8 * (1 + d.doc_id % 3) AS BIGINT) AS jpeg_height,
       CAST(1 AS BIGINT) AS jpeg_channels,
       CAST((d.doc_id % 256) * 8 * (1 + d.doc_id % 2) * 8 * (1 + d.doc_id % 3) AS BIGINT) AS jpeg_pixel_sum,
       CAST((SELECT sum((x.i * 7 + y.i * 13 + d.doc_id) % 256)
             FROM unnest(range(0, 16)) x(i), unnest(range(0, 12)) y(i)) AS BIGINT) AS png_pixel_sum,
       CAST((SELECT sum(CASE WHEN d.doc_id % 2 = 1 THEN
               CASE WHEN ((255 - ((s.i * 37 + d.doc_id) % 256)) & 128) = 128
                    THEN -((((255 - ((s.i * 37 + d.doc_id) % 256)) & 15) * 8 + 132)
                           * (1 << (((255 - ((s.i * 37 + d.doc_id) % 256)) >> 4) & 7)) - 132)
                    ELSE ((((255 - ((s.i * 37 + d.doc_id) % 256)) & 15) * 8 + 132)
                          * (1 << (((255 - ((s.i * 37 + d.doc_id) % 256)) >> 4) & 7)) - 132)
               END
             ELSE (s.i * 37 + d.doc_id) % 256 END)
             FROM unnest(range(0, 199 + d.doc_id % 57)) s(i)) AS BIGINT) AS wav_sample_sum,
       CAST((199 + d.doc_id % 57) * 1000 // (8000 + d.doc_id % 100) AS BIGINT) AS wav_duration_ms
FROM tx d JOIN plane p ON p.doc_id = d.doc_id
""",
    tags=("multimodal",),
    doc="Arrow-batched (mapInPandas) multimodal path, every half real: "
    "byte features over the opaque binary payload; an actual netpbm "
    "decode — each document rendered as a valid raw P6 PPM (header + "
    "8x6 RGB plane from its text bytes) and decoded by the pure-Python "
    "parser (docs are ASCII, so the SQL oracle mirrors the plane with "
    "character math); and THREE codec ROUND TRIPS per doc inside one "
    "Arrow pass (operators/multimodal.py codec_roundtrip_features): "
    "baseline JPEG (functions/jpeg.py — flat image + all-ones "
    "quantization makes the DC path byte-exact, pixel_sum closed-form; "
    "lossy AC paths round-trip-tested in tests/test_jpeg.py), PNG "
    "(functions/png.py — zlib inflate + all five scanline unfilters, "
    "cycled by doc_id, over a NON-trivial gradient; lossless, so the "
    "oracle's double-range sum must match exactly), and PCM WAV "
    "(functions/audio.py — RIFF walk over a doc-length ramp signal "
    "(199 + doc_id % 57 samples, never a 256-multiple, so the sum is "
    "doc-discriminative); sample_sum + duration closed-form; odd docs "
    "round-trip G.711 mu-law, whose table expansion the oracle "
    "reproduces as a closed-form CASE). The oracle verifies all three "
    "codecs without decoding anything itself. Odd docs exercise "
    "progressive (SOF2) JPEG and Adam7-interlaced PNG. Remaining "
    "permanent envelope stubs: arithmetic/12-bit/lossless JPEG, "
    "sub-8-bit PNG depths, MP3/AAC audio.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        mm.binary_features(docs)
        .join(mm.decoded_image_features(docs), "doc_id")
        .join(mm.codec_roundtrip_features(docs), "doc_id")
    )
