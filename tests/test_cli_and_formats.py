"""CLI parity (reference ./tema1 interface) and format round-trips."""

from __future__ import annotations

import os
import string
import subprocess
import sys

import pytest

from parallel_inverted_index_map_reduce_spark.sources import formats
from parallel_inverted_index_map_reduce_spark.sources.tables import load_table

from .conftest import SF_ORACLE

CHECKER = "/root/reference/checker"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isdir(CHECKER), reason="reference checkout absent")
def test_cli_builds_reference_output(tmp_path):
    out = tmp_path / "cli_out"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "parallel_inverted_index_map_reduce_spark",
            "--mappers",
            "2",
            "--reducers",
            "2",
            "--out",
            str(out),
            os.path.join(CHECKER, "test_small.txt"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for letter in string.ascii_lowercase:
        with open(out / f"{letter}.txt") as fh:
            ours = [" ".join(l.split()) for l in fh if l.strip()]
        with open(os.path.join(CHECKER, "test_out_small", f"{letter}.txt")) as fh:
            golden = [" ".join(l.split()) for l in fh if l.strip()]
        assert ours == golden, letter


@pytest.mark.parametrize("table", ["orders", "events", "nation"])
def test_csv_roundtrip(spark, tmp_path, table):
    df = load_table(spark, SF_ORACLE, table)
    path = str(tmp_path / f"{table}_csv")
    formats.write_csv(df, path)
    back = formats.read_csv(spark, path, df.schema)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


@pytest.mark.parametrize("table", ["customer", "events"])
def test_jsonl_roundtrip(spark, tmp_path, table):
    df = load_table(spark, SF_ORACLE, table)
    path = str(tmp_path / f"{table}_json")
    formats.write_jsonl(df, path)
    back = formats.read_jsonl(spark, path, df.schema)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_embeddings_roundtrip_jsonl(spark, tmp_path):
    """Array<float> columns survive the JSON edge."""
    df = load_table(spark, SF_ORACLE, "embeddings")
    path = str(tmp_path / "emb_json")
    formats.write_jsonl(df, path)
    back = formats.read_jsonl(spark, path, df.schema)
    a = sorted((r.vec_id, tuple(r.embedding)) for r in df.collect())
    b = sorted((r.vec_id, tuple(r.embedding)) for r in back.collect())
    assert a == b
