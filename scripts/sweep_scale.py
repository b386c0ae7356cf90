#!/usr/bin/env python
"""Above-registry-scale correctness sweep: drive every __spark_entry__
query at an arbitrary sf directory and verify against DuckDB.

The grading driver checks sf0.01; this tool extends the same evidence
to sf1/sf10-class directories (scripts/gen_sf_scale.py), where round 8
proved latent bugs live. Three verification modes, chosen per entry:

- verbatim (default): the registry oracle_sql string, driver-style
  stringified sorted-row compare. With a tuned DuckDB connection
  (threads=CPUs, a real memory_limit) the banded minhash oracles that
  looked intractable in round 8 run in single-digit seconds at sf1.
- checksum: for entries whose OUTPUT is too large to ship through the
  Python driver (simhash_near_dups emits ~148M true pairs at sf1 —
  the 32-bit fingerprint's 4-5-bit pigeonhole blocks saturate on a
  50k-doc corpus), BOTH engines reduce the full result to
  (count, xor of per-row md5, sum of per-row md5) over the SAME
  canonical row rendering — full-content verification with O(1)
  transfer. Only eligible when every output column renders identically
  across engines (integers / strings / booleans).
- twin: a scalable reformulation for oracles whose FORMULATION cannot
  scale (dedup_clusters' recursive-CTE reachability closure enumerates
  every (node, reachable-root) pair — quadratic in cluster size). The
  twin resolves components by iterative neighbor-min label propagation
  over temp tables, converging in O(diameter) joins. Twins must be
  validated against the verbatim oracle at registry scale first:
  --selftest runs twin vs verbatim at the given (small) sf and fails
  on any divergence.

Usage:
  python scripts/sweep_scale.py /tmp/sf1 [--only a,b] [--skip a,b]
  python scripts/sweep_scale.py /root/testdata/sf0.01 --selftest
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# entries verified by in-engine checksum instead of row shipping (all
# integer columns; output too large for the Python driver above sf0.1)
CHECKSUM_ENTRIES = {"simhash_near_dups"}

NULL_TOKEN = "@@NULL@@"


def duck_connect(sf_dir: str):
    import duckdb

    conn = duckdb.connect()
    conn.execute(f"PRAGMA threads={os.cpu_count()}")
    # ONE memory budget for the whole process: the Spark driver heap
    # and DuckDB coexist in it, so a fixed 80GB DuckDB limit under a
    # 48g driver oversubscribes a 128G box — DuckDB then dies on a raw
    # std::bad_alloc ('failed to allocate block') instead of spilling,
    # and the round-11 single-session sf10 sweep lost pipeline_hygiene
    # exactly that way. Default duck limit = total - driver - 16G
    # margin (clamped to [16, 80]); SWEEP_DUCK_MEM overrides.
    duck_mem = os.environ.get("SWEEP_DUCK_MEM")
    if not duck_mem:
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (
            1 << 30
        )
        driver_gb = int(
            "".join(
                c for c in os.environ.get("SWEEP_DRIVER_MEM", "12g") if c.isdigit()
            )
            or 12
        )
        duck_mem = f"{max(16, min(80, total_gb - driver_gb - 16))}GB"
    print(f"DUCK memory_limit={duck_mem}", flush=True)
    conn.execute(f"SET memory_limit='{duck_mem}'")
    os.makedirs("/tmp/duckspill", exist_ok=True)
    conn.execute("SET temp_directory='/tmp/duckspill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
    return conn


def spark_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .appName("sweep-scale")
        .getOrCreate()
    )


# ---------------------------------------------------------------- checksum


def _spark_checksum(sdf):
    """(count, xor60, sum60) over md5 of the canonical row rendering:
    columns sorted by name, each cast to string, nulls -> NULL_TOKEN,
    joined with '|'. 15 hex chars = 60 bits per row; xor is
    order-independent, the decimal sum catches xor-cancelling swaps."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN)) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    row = sdf.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(h), F.lit(0)).alias("x"),
        F.coalesce(F.sum(h.cast("decimal(38,0)")), F.lit(0)).alias("s"),
    ).first()
    return int(row["n"]), int(row["x"]), int(row["s"])


def _duck_checksum(conn, sql: str, cols: list[str]):
    canon = " || '|' || ".join(
        f"COALESCE(CAST({_q(c)} AS VARCHAR), '{NULL_TOKEN}')" for c in sorted(cols)
    )
    h = f"CAST('0x' || substr(md5({canon}), 1, 15) AS BIGINT)"
    row = conn.sql(
        f"SELECT count(*), COALESCE(bit_xor({h}), 0), "
        f"COALESCE(sum(CAST({h} AS DECIMAL(38,0))), 0) FROM ({sql})"
    ).fetchone()
    return int(row[0]), int(row[1]), int(row[2])


def _q(col: str) -> str:
    return '"' + col.replace('"', '""') + '"'


class _Watchdog:
    """Per-entry wall-clock bound: after ``seconds``, cancel every
    running Spark job AND interrupt the DuckDB connection, so a single
    pathological entry (an unforeseen saturation regime at a new sf)
    surfaces as a recorded timeout instead of eating the sweep's wall.
    Cancellation raises inside the blocked action; the sweep's per-entry
    except records it and moves on. ``fired`` disambiguates a genuine
    engine error from the watchdog's own cancellation."""

    def __init__(self, spark, conn, seconds: float):
        import threading

        self.fired = False
        self._stop = threading.Event()

        def run():
            if self._stop.wait(seconds):
                return
            # keep cancelling until the entry's frame exits:
            # cancelAllJobs/interrupt only hit work that is RUNNING at
            # call time, and an entry is a sequence of jobs/queries —
            # a one-shot fire would let every later job through.
            self.fired = True
            while not self._stop.is_set():
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:  # noqa: BLE001 — context may be dead
                    pass
                try:
                    conn.interrupt()
                except Exception:  # noqa: BLE001 — older duckdb/closed
                    pass
                self._stop.wait(2)

        self._t = threading.Thread(target=run, daemon=True)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        # join before returning: a fired watchdog loops cancel/interrupt
        # every 2s, and an iteration already in flight (or blocked inside
        # interrupt()) would otherwise land on the NEXT entry's jobs,
        # falsely recording a healthy entry as error. The loop observes
        # the stop event within one 2s wait.
        self._t.join()
        return False


def _part_values(sdf, conn, dsql: str, pc: str) -> list:
    """UNION of both engines' DISTINCT part values, so an arm that
    emits rows on one side only still gets compared (per-part equality
    implies whole-entry equality only if the part-value sets match —
    enumerating from the oracle alone would skip Spark-only values).
    NULL part values would vanish from every ``= value`` filter on
    both sides, so they fail loudly instead."""
    o_vals = [
        r[0]
        for r in conn.sql(
            f"SELECT DISTINCT {_q(pc)} FROM ({dsql}) ORDER BY 1"
        ).fetchall()
    ]
    s_vals = [r[0] for r in sdf.select(pc).distinct().collect()]
    if any(v is None for v in o_vals) or any(v is None for v in s_vals):
        raise ValueError(
            f"NULL {pc!r} part value (oracle has null: "
            f"{any(v is None for v in o_vals)}, spark has null: "
            f"{any(v is None for v in s_vals)}) — per-part compare "
            "cannot see NULL-keyed rows"
        )
    return sorted(set(map(str, o_vals)) | set(map(str, s_vals)))


def _checksum_eligible(sdf) -> bool:
    from pyspark.sql import types as T

    ok = (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.StringType,
          T.BooleanType)
    return all(isinstance(f.dataType, ok) for f in sdf.schema.fields)


# ---------------------------------------------------------- staged replay


def _split_with_block(sql: str):
    """Parse ``WITH a AS (...), b(x,y) AS (...) <final>`` into
    ([(name, collist|None, body), ...], final). Balanced-paren scan
    that skips single-quoted string literals (SQL's '' escape), so
    regex patterns containing parens can't derail the depth count."""
    import re

    s = sql.strip()
    m = re.match(r"WITH\s+(RECURSIVE\s+)?", s, re.I)
    if not m:
        raise ValueError("oracle has no WITH block")
    i = m.end()
    head = re.compile(
        r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^)]*)\))?\s+AS\s+"
        r"(?:MATERIALIZED\s+)?\(",
        re.I,
    )
    ctes = []
    while True:
        m = head.match(s, i)
        if not m:
            raise ValueError(f"cannot parse CTE header at ...{s[i:i+80]!r}")
        name, collist = m.group(1), m.group(2)
        j = m.end()
        # the body scan must not count parens/quotes inside string
        # literals ('' escape), double-quoted identifiers ("" escape),
        # -- line comments, or /* */ block comments (text_quality's
        # oracle carries -- comments); malformed input is a parse
        # error, not an IndexError past the end
        depth, k = 1, j
        while depth:
            if k >= len(s):
                raise ValueError(
                    f"unbalanced parens in CTE {name!r} body "
                    f"(depth {depth} at end of input)"
                )
            ch = s[k]
            if ch == "'" or ch == '"':
                quote, k = ch, k + 1
                while True:
                    if k >= len(s):
                        raise ValueError(
                            f"unterminated {quote}-quoted token in CTE "
                            f"{name!r} body"
                        )
                    if s[k] == quote:
                        if s[k + 1 : k + 2] == quote:
                            k += 2  # doubled quote, stay inside
                            continue
                        break
                    k += 1
            elif ch == "-" and s[k + 1 : k + 2] == "-":
                while k < len(s) and s[k] != "\n":
                    k += 1
                continue
            elif ch == "/" and s[k + 1 : k + 2] == "*":
                end = s.find("*/", k + 2)
                if end < 0:
                    raise ValueError(
                        f"unterminated block comment in CTE {name!r} body"
                    )
                k = end + 2
                continue
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            k += 1
        ctes.append((name, collist, s[j : k - 1]))
        i = k
        while i < len(s) and s[i].isspace():
            i += 1
        if i < len(s) and s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


def staged_replay(conn, oracle_sql: str):
    """Land every CTE of ``oracle_sql`` as a temp table, in order, and
    return (final_select, created_names). Each later CTE's references
    to earlier names resolve to the just-created temp tables, so this
    is the VERBATIM oracle computed stage by stage: bit-identical
    output (selftest-pinned), but each stage is a bounded query DuckDB
    can plan and spill independently — where the one-shot form at
    sf10 recomputes inlined CTE chains and exhausted 77 GB of temp
    disk (round 9's minhash_near_dups / pipeline_hygiene exclusions),
    the staged form lands the same tables in seconds. Callers must
    drop ``created_names`` afterwards (names may shadow other oracles'
    CTEs only until then — a CTE always shadows a same-named table)."""
    import re

    ctes, final = _split_with_block(oracle_sql)
    # liveness: drop each staged table right after its LAST textual
    # reference (word-boundary match in a later body or the final
    # select). pipeline_hygiene at sf10 stages ~90 CTEs totalling tens
    # of GB; without pruning the dead ones (token/gram/BPE-round
    # intermediates) stay resident and the final UNION ALL — itself
    # dozens of concurrent arms — hits the memory limit. Column names
    # shadowing a table name only make pruning more conservative
    # (kept longer), never drop a live table.
    last_use = {}
    for i, (name, _c, _b) in enumerate(ctes):
        pat = re.compile(rf"\b{re.escape(name)}\b")
        last = len(ctes)  # sentinel: referenced by final (or never)
        if not pat.search(final):
            last = i
            for j in range(len(ctes) - 1, i, -1):
                if pat.search(ctes[j][2]):
                    last = j
                    break
        last_use[name] = last
    created = []
    for i, (name, collist, body) in enumerate(ctes):
        if collist:
            q = (
                f"CREATE OR REPLACE TEMP TABLE {name} AS "
                f"SELECT * FROM ({body}) AS _t({collist})"
            )
        else:
            q = f"CREATE OR REPLACE TEMP TABLE {name} AS {body}"
        conn.execute(q)
        created.append(name)
        for prior in list(created):
            if last_use[prior] <= i:
                conn.execute(f"DROP TABLE IF EXISTS {prior}")
                created.remove(prior)
    return final, created


def _drop_staged(conn, names) -> None:
    for n in reversed(names):
        try:
            conn.execute(f"DROP TABLE IF EXISTS {n}")
        except Exception:  # noqa: BLE001 — cleanup must not mask results
            pass


# entries whose verbatim oracle is correct but whose ONE-SHOT evaluation
# cannot scale (CTE-inlining recomputation + monolithic spill): replayed
# stage-by-stage through temp tables instead. Output compare mode is
# then chosen exactly like a verbatim entry (checksum-auto eligible).
# ann_topk's WITH block references the 64-wide exploded comp CTE from
# ~8 arms — inlined, that is ~8 recomputations of a 12.8M-row unnest
# at sf10; staged, comp lands once.
STAGED = {"minhash_near_dups", "pipeline_hygiene", "ann_topk"}

# multi-part union entries whose SPARK side must checksum PER PART at
# big sf: one checksum job over the whole union evaluates every arm
# CONCURRENTLY (measured ~3x the sequential parts' cost at sf10 — the
# arms' shuffles/broadcasts are all live at once and spill), while a
# constant filter on the part column prunes the other union arms at
# plan time (each lit(op)=v branch folds to false and drops), so
# per-part jobs run the arms one at a time. Per-part equality implies
# whole-entry equality: the part column partitions the output rows.
# Requires the entry to also be in STAGED (part values are read from
# the staged oracle's temp tables for pennies).
PARTED = {"ann_topk": "op"}


# ------------------------------------------------------------------ twins


def twin_dedup_clusters(conn):
    """Scalable dedup_clusters oracle: SAME edge set as the verbatim
    oracle (banded MinHash candidates among exact-dedup canonicals,
    decimal-round-6 Jaccard >= 0.8 verify, plus exact-dup edges), but
    components resolved by ITERATIVE neighbor-min label propagation
    over temp tables — O(diameter) passes over the edge list — instead
    of the recursive-CTE reachability closure, which materializes every
    (node, reachable-root) pair and is quadratic in cluster size.
    The candidate/intersection tables come from a staged replay of the
    minhash_near_dups oracle (same MINHASH_CTE chain), so the edge
    inputs are stage-bounded too — the round-9 sf10 exclusion was the
    INLINE recomputation of that chain spilling 77 GB, not the closure.
    Returns (columns, rows). Validated equal to the verbatim oracle at
    registry scale by --selftest."""
    import __spark_entry__ as entry

    staged = []
    try:
        _, staged = staged_replay(conn, entry.oracle_sql()["minhash_near_dups"])
        return _label_prop_clusters(conn)
    finally:
        _drop_staged(conn, staged)
        _drop_staged(conn, ["t_edges", "t_lbl", "t_nxt"])


def _label_prop_clusters(conn):
    """Edge construction (over the staged cand/inter/sizes tables) +
    label-propagation closure + the verbatim oracle's final projection."""
    conn.execute(
        """CREATE OR REPLACE TEMP TABLE t_edges AS WITH
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
)
SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0"""
    )
    conn.execute(
        "CREATE OR REPLACE TEMP TABLE t_lbl AS "
        "SELECT DISTINCT a AS node, a AS comp FROM t_edges"
    )
    for _ in range(64):
        conn.execute(
            """CREATE OR REPLACE TEMP TABLE t_nxt AS
SELECT l.node, least(l.comp, COALESCE(m.mn, l.comp)) AS comp
FROM t_lbl l LEFT JOIN (
    SELECT e.b AS node, min(l2.comp) AS mn
    FROM t_edges e JOIN t_lbl l2 ON l2.node = e.a
    GROUP BY e.b
) m ON m.node = l.node"""
        )
        changed = conn.sql(
            "SELECT count(*) FROM t_nxt n JOIN t_lbl l "
            "ON l.node = n.node AND l.comp <> n.comp"
        ).fetchone()[0]
        conn.execute("CREATE OR REPLACE TEMP TABLE t_lbl AS SELECT * FROM t_nxt")
        if changed == 0:
            break
    else:
        raise RuntimeError("dedup_clusters twin did not converge in 64 rounds")
    rel = conn.sql(
        """
WITH clusters AS (
    SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN t_lbl c ON c.node = d.doc_id
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
FROM clusters cl JOIN best b ON b.cluster_id = cl.cluster_id"""
    )
    cols = list(rel.columns)
    return cols, rel.fetchall()


TWINS = {"dedup_clusters": twin_dedup_clusters}


def _print_provenance_header(conn, sf_dir: str) -> None:
    """Pin WHAT corpus this sweep ran against, in the log itself: the
    generator's _PROVENANCE.json sidecar (scripts/gen_sf_scale.py
    records argv + dense-key assertion there) plus a LIVE per-table
    row count and order-independent content fingerprint
    (bit_xor of per-row hash). A future ad-hoc regeneration of
    /tmp/sfN can then never silently change the corpus under
    previously recorded tallies — the fingerprints won't match."""
    prov = os.path.join(sf_dir, "_PROVENANCE.json")
    if os.path.exists(prov):
        with open(prov) as f:
            print(f"PROVENANCE {prov}: {json.dumps(json.load(f))}", flush=True)
    else:
        print(f"PROVENANCE {prov}: absent (pre-r10 generation)", flush=True)
    parts = []
    for t in TABLES:
        n, x = conn.sql(
            f"SELECT count(*), COALESCE(bit_xor(hash(t)), 0) FROM {t} t"
        ).fetchone()
        parts.append(f"{t}=n{n}x{int(x) & 0xFFFFFFFFFFFFFFFF:016x}")
    print(f"FINGERPRINT {sf_dir}: {' '.join(parts)}", flush=True)


def _simhash_capped(spark, conn, sf_dir: str, cap: int):
    """EXTRA evidence row for simhash_near_dups at saturation scales:
    both engines restricted to the SAME deterministic md5-ordered
    ``cap``-doc subset (the _capped_emb anchor rule from
    plans/queries_similarity.py, applied to documents), then the usual
    in-engine checksum compare. The registry entry itself stays
    uncapped and excluded above sf1 — 32-bit fingerprint saturation
    makes TRUE pairs quadratic in the corpus — but this runs the
    operator's real banding/verify path against the target directory's
    own corpus, so the scaled path has direct evidence at any sf.
    Returns (ok, n_rows, spark_sec)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from parallel_inverted_index_map_reduce_spark.operators import dedup as dd
    from parallel_inverted_index_map_reduce_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .orderBy("h", "doc_id")
        .limit(cap)
        .select("doc_id")
    )
    capped = docs.join(F.broadcast(top), "doc_id", "left_semi")
    sdf = dd.simhash_near_dups(capped, max_hamming=6)
    t0 = time.time()
    sn, sx, ss = _spark_checksum(sdf)
    t_spark = time.time() - t0
    # the oracle's ONLY base-table reference is TOKS_POS_CTE's
    # "FROM documents": swap in the identical md5-ordered subset
    sub = (
        "(SELECT * FROM documents "
        f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {cap})"
    )
    osql = entry.oracle_sql()["simhash_near_dups"].replace(
        "FROM documents", "FROM " + sub
    )
    n, x, s = _duck_checksum(conn, osql, sorted(sdf.columns))
    return (sn, sx, ss) == (n, x, s), sn, t_spark


# ------------------------------------------------------------------ sweep


# ------------------------------------------------------------------ sweep


def rows_of_spark(sdf):
    cols = sorted(sdf.columns)
    return cols, sorted(
        tuple(str(r[c]) for c in cols) for r in sdf.collect()
    )


def rows_of_duck(rel):
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    return cols, sorted(tuple(str(r[i]) for i in idx) for r in rel.fetchall())


def respawn_session(old, cpus: int):
    """Replace a session whose JVM died (executor OOM in local mode
    kills the whole process). PySpark caches the py4j gateway and the
    active context/session module-globally; all of it must be cleared
    or getOrCreate keeps handing back proxies to the dead JVM."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        old.stop()
    except Exception:  # noqa: BLE001 — it is already dead
        pass
    with SparkContext._lock:
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None
    spark = spark_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--cpus", type=int, default=os.cpu_count())
    ap.add_argument(
        "--selftest",
        action="store_true",
        help="validate twins + checksum mode against the verbatim "
        "oracle/rows at this (small) sf instead of sweeping Spark",
    )
    ap.add_argument(
        "--checksum-auto",
        action="store_true",
        help="use in-engine checksum compare for EVERY entry whose "
        "output schema is checksum-eligible (int/string/bool only), "
        "not just CHECKSUM_ENTRIES — full-content verification with "
        "O(1) transfer for multi-million-row outputs at sf10-class "
        "directories. Twins still take precedence (their verbatim "
        "oracle is the thing that cannot scale).",
    )
    ap.add_argument(
        "--simhash-cap",
        type=int,
        default=0,
        help="additionally verify simhash_near_dups over the "
        "md5-ordered first N documents (both engines, checksum mode) — "
        "direct evidence for the operator's scaled path at saturation "
        "scales where the uncapped entry's true-pair count is "
        "quadratic (see _simhash_capped).",
    )
    ap.add_argument(
        "--entry-timeout",
        type=float,
        default=0,
        help="per-entry wall bound in seconds (0 = none): on expiry the "
        "watchdog cancels all Spark jobs and interrupts DuckDB, the "
        "entry is recorded as 'timeout', and the sweep continues — for "
        "sf10-class runs where one saturation regime must not stall "
        "the tally.",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}
    names = [n for n in sorted(q) if (not only or n in only) and n not in skip]

    conn = duck_connect(args.sf_dir)
    _print_provenance_header(conn, args.sf_dir)

    if args.selftest:
        fails = []
        for name, twin in TWINS.items():
            t0 = time.time()
            tc, tr = twin(conn)
            want = rows_of_duck(conn.sql(o[name]))
            got = (sorted(tc), sorted(tuple(str(v) for v in _reorder(r, tc)) for r in tr))
            ok = got == want
            print(f"twin {name}: {'OK' if ok else 'DIVERGED'} "
                  f"({len(got[1])} rows, {time.time()-t0:.1f}s)", flush=True)
            if not ok:
                fails.append(name)
        for name in sorted(STAGED):
            t0 = time.time()
            staged = []
            try:
                final, staged = staged_replay(conn, o[name])
                got = rows_of_duck(conn.sql(final))
            finally:
                _drop_staged(conn, staged)
            want = rows_of_duck(conn.sql(o[name]))
            ok = got == want
            print(f"staged {name}: {'OK' if ok else 'DIVERGED'} "
                  f"({len(got[1])} rows, {time.time()-t0:.1f}s)", flush=True)
            if not ok:
                fails.append(name)
        for name in sorted(CHECKSUM_ENTRIES):
            t0 = time.time()
            rel = conn.sql(o[name])
            cols = list(rel.columns)
            n, x, s = _duck_checksum(conn, o[name], cols)
            spark = spark_session(args.cpus)
            spark.sparkContext.setLogLevel("ERROR")
            sdf = q[name](spark, args.sf_dir)
            assert _checksum_eligible(sdf), f"{name}: non-checksummable schema"
            sn, sx, ss = _spark_checksum(sdf)
            ok = (n, x, s) == (sn, sx, ss)
            print(f"checksum {name}: {'OK' if ok else 'DIVERGED'} "
                  f"(n={n} vs {sn}, {time.time()-t0:.1f}s)", flush=True)
            if not ok:
                fails.append(name)
        print("SELFTEST FAILURES:", fails or "none")
        sys.exit(1 if fails else 0)

    spark = spark_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    fails: list[str] = []
    t_sweep = time.time()
    for name in names:
        # a prior entry OOM-killing the JVM must not poison the rest of
        # the sweep: rebuild the session if the context died
        try:
            dead = spark._jsc.sc().isStopped()
        except Exception:  # noqa: BLE001 — dead gateway counts as dead
            dead = True
        if dead:
            print(f"(SparkContext died — rebuilding session before {name})",
                  flush=True)
            spark = respawn_session(spark, args.cpus)
        t0 = time.time()
        wd = (
            _Watchdog(spark, conn, args.entry_timeout)
            if args.entry_timeout
            else None
        )
        try:
            if wd is not None:
                wd.__enter__()
            sdf = q[name](spark, args.sf_dir)
            if (
                name not in TWINS
                and (name in CHECKSUM_ENTRIES or args.checksum_auto)
                and _checksum_eligible(sdf)
            ):
                mode = "staged+checksum" if name in STAGED else "checksum"
                dsql, staged_names = o[name], []
                try:
                    pc = PARTED.get(name) if name in STAGED else None
                    if name in STAGED:
                        dsql, staged_names = staged_replay(conn, o[name])
                    if pc:
                        mode += "/part"
                        from pyspark.sql import functions as F

                        vals = _part_values(sdf, conn, dsql, pc)
                        ok, n_rows = True, 0
                        cols = sorted(sdf.columns)
                        for v in vals:
                            sn, sx, ss = _spark_checksum(
                                sdf.where(F.col(pc) == v)
                            )
                            lit = str(v).replace("'", "''")
                            n, x, s = _duck_checksum(
                                conn,
                                f"SELECT * FROM ({dsql}) "
                                f"WHERE {_q(pc)} = '{lit}'",
                                cols,
                            )
                            p_ok = (sn, sx, ss) == (n, x, s)
                            print(f"  part {pc}={v}: "
                                  f"{'ok' if p_ok else 'MISMATCH'} "
                                  f"rows={sn} vs {n}", flush=True)
                            ok, n_rows = ok and p_ok, n_rows + sn
                        t_spark = time.time() - t0
                    else:
                        sn, sx, ss = _spark_checksum(sdf)
                        t_spark = time.time() - t0
                        n, x, s = _duck_checksum(conn, dsql, sorted(sdf.columns))
                        ok, n_rows = (sn, sx, ss) == (n, x, s), sn
                finally:
                    _drop_staged(conn, staged_names)
            elif name in TWINS:
                mode = "twin"
                scols, srows = rows_of_spark(sdf)
                t_spark = time.time() - t0
                tc, tr = TWINS[name](conn)
                dcols = sorted(tc)
                drows = sorted(
                    tuple(str(v) for v in _reorder(r, tc)) for r in tr
                )
                ok, n_rows = (scols, srows) == (dcols, drows), len(srows)
            else:
                mode = "staged" if name in STAGED else "verbatim"
                dsql, staged_names = o[name], []
                try:
                    pc = PARTED.get(name) if name in STAGED else None
                    if pc:
                        # per-part row compare: same plan-time arm
                        # pruning as the checksum variant; these
                        # entries' outputs are top-k/anchor-bounded,
                        # so per-part row shipping is cheap
                        mode += "/part"
                        from pyspark.sql import functions as F

                        dsql, staged_names = staged_replay(conn, o[name])
                        vals = _part_values(sdf, conn, dsql, pc)
                        ok, n_rows = True, 0
                        for v in vals:
                            scols, srows = rows_of_spark(
                                sdf.where(F.col(pc) == v)
                            )
                            lit = str(v).replace("'", "''")
                            dcols, drows = rows_of_duck(conn.sql(
                                f"SELECT * FROM ({dsql}) "
                                f"WHERE {_q(pc)} = '{lit}'"
                            ))
                            p_ok = (scols, srows) == (dcols, drows)
                            print(f"  part {pc}={v}: "
                                  f"{'ok' if p_ok else 'MISMATCH'} "
                                  f"rows={len(srows)} vs {len(drows)}",
                                  flush=True)
                            ok, n_rows = ok and p_ok, n_rows + len(srows)
                        t_spark = time.time() - t0
                    else:
                        scols, srows = rows_of_spark(sdf)
                        t_spark = time.time() - t0
                        if name in STAGED:
                            dsql, staged_names = staged_replay(conn, o[name])
                        dcols, drows = rows_of_duck(conn.sql(dsql))
                        ok, n_rows = (
                            (scols, srows) == (dcols, drows),
                            len(srows),
                        )
                finally:
                    _drop_staged(conn, staged_names)
            wall = time.time() - t0
            results[name] = {
                "ok": bool(ok), "mode": mode, "rows": n_rows,
                "spark_sec": round(t_spark, 1), "wall_sec": round(wall, 1),
            }
            print(f"{name}: {'OK' if ok else 'FAIL'} [{mode}] rows={n_rows} "
                  f"spark={t_spark:.1f}s wall={wall:.1f}s", flush=True)
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            kind = "timeout" if (wd is not None and wd.fired) else "error"
            results[name] = {"ok": False, "mode": kind,
                             "err": f"{type(ex).__name__}: {ex}"[:300]}
            print(f"{name}: {kind.upper()} {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            fails.append(name)
        finally:
            if wd is not None:
                wd.__exit__(None, None, None)
    if args.simhash_cap:
        name = f"simhash_near_dups@cap{args.simhash_cap}"
        t0 = time.time()
        wd = (
            _Watchdog(spark, conn, args.entry_timeout)
            if args.entry_timeout
            else None
        )
        try:
            if wd is not None:
                wd.__enter__()
            ok, n_rows, t_spark = _simhash_capped(
                spark, conn, args.sf_dir, args.simhash_cap
            )
            wall = time.time() - t0
            results[name] = {
                "ok": bool(ok), "mode": "checksum", "rows": n_rows,
                "spark_sec": round(t_spark, 1), "wall_sec": round(wall, 1),
            }
            print(f"{name}: {'OK' if ok else 'FAIL'} [checksum] "
                  f"rows={n_rows} spark={t_spark:.1f}s "
                  f"wall={wall:.1f}s", flush=True)
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            kind = "timeout" if (wd is not None and wd.fired) else "error"
            results[name] = {"ok": False, "mode": kind,
                             "err": f"{type(ex).__name__}: {ex}"[:300]}
            print(f"{name}: {kind.upper()} {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            fails.append(name)
        finally:
            if wd is not None:
                wd.__exit__(None, None, None)
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "total_sec": round(time.time() - t_sweep, 1),
        "n": len(names),
        "failures": fails,
        "results": results,
    }))
    sys.exit(1 if fails else 0)


def _reorder(row, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return tuple(row[i] for i in order)


if __name__ == "__main__":
    main()
