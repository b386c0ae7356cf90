"""CLI mirroring the reference binary's interface.

Reference: ``./tema1 <mappers> <reducers> <manifest>`` writes
``a.txt .. z.txt`` into the working directory
(/root/reference/src/main.cpp:9-42,298-320). Here:

    python -m parallel_inverted_index_map_reduce_spark \
        --mappers 4 --reducers 4 --out ./out <manifest>

``--mappers``/``--reducers`` are accepted for interface parity; Spark
schedules tasks itself, so they only size local parallelism and shuffle
partitions (the reference's thread counts are physical-execution knobs
its checker varies — SURVEY.md §4.2 maps them to Spark's scheduler).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="parallel_inverted_index_map_reduce_spark",
        description="Build the per-letter inverted index for a manifest corpus.",
    )
    parser.add_argument("manifest", help="manifest file: count then one path per line")
    parser.add_argument("--mappers", type=int, default=4, help="parallelism hint")
    parser.add_argument("--reducers", type=int, default=4, help="parallelism hint")
    parser.add_argument("--out", default=".", help="output directory for a.txt..z.txt")
    args = parser.parse_args(argv)

    from .operators.index import build_index
    from .session import get_spark
    from .sinks.text_index import write_index_text
    from .sources.corpus import read_manifest_corpus

    cores = max(args.mappers, args.reducers, 1)
    spark = get_spark(
        app_name="build-index",
        master=f"local[{cores}]",
        shuffle_partitions=max(args.reducers, 1) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = read_manifest_corpus(spark, args.manifest)
        index = build_index(docs)  # manifest ids are already 1-based
        write_index_text(index, args.out)
        print(f"wrote {args.out}/a.txt .. z.txt")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
