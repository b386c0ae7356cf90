"""Manifest corpus sources: URI decoding and whole-text reassembly.

The manifest format is whitespace-tokenized (faithful to the
reference's fscanf("%s"), src/main.cpp:59-80), so paths can never
contain spaces — but they CAN contain '%' and literal '+', which
input_file_name() percent-encodes ('%' -> '%25'). The manifest join
must decode the URI before matching or those documents silently drop
out of the inner join. manifest_documents must keep multi-line files
in byte order (wholetext read), which collect_list reassembly could
not guarantee."""

from __future__ import annotations

from parallel_inverted_index_map_reduce_spark.sources.corpus import (
    manifest_documents,
    read_manifest_corpus,
)


def _mk_corpus(tmp_path, files: dict[str, str]) -> str:
    for name, text in files.items():
        (tmp_path / name).write_text(text)
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(f"{len(files)}\n" + "\n".join(files) + "\n")
    return str(manifest)


def test_awkward_paths_survive_the_manifest_join(spark, tmp_path):
    files = {
        "plain.txt": "alpha beta",
        "plus+file.txt": "delta",
        "pct%file.txt": "epsilon",
    }
    m = _mk_corpus(tmp_path, files)
    rows = read_manifest_corpus(spark, m).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}, rows
    by_id = {r.doc_id: r.text for r in rows}
    assert by_id[2] == "delta"
    assert by_id[3] == "epsilon"


def test_manifest_documents_preserves_line_order(spark, tmp_path):
    files = {
        "multi_line.txt": "first line\nsecond line\nthird line\n",
        "single.txt": "only one",
    }
    m = _mk_corpus(tmp_path, files)
    docs = {r.doc_id: r.text for r in manifest_documents(spark, m).collect()}
    assert docs[1] == "first line second line third line"
    assert docs[2] == "only one"
