"""PySpark-native analytics engine with the capabilities of
``bogdanstoicasn/parallel-inverted-index-map-reduce`` (reference at
/root/reference, read-only), re-expressed Spark-first.

The reference is a pthreads MapReduce inverted-index builder
(``src/main.cpp``, ``src/tema1.h``). This package expresses the same
dataflow — scan -> tokenize -> normalize -> distinct -> group-by-key ->
bucket -> sort -> formatted sink — as declarative DataFrame plans that
Catalyst/Tungsten optimize, plus the query surface an inverted index
exists to serve (term lookup, boolean search, ranking) and the
large-scale data-pipeline operators (dedup, similarity search, text
analysis, streaming) a 100 TB corpus needs.

Layout:
    sources/    manifest + corpus + parquet table readers
    functions/  reusable column-expression library (text, hashing, vectors)
    operators/  index build/query, dedup, similarity, textstats, multimodal
    plans/      query registry: name -> (spark fn, oracle SQL) pairs
    streaming/  Structured Streaming variants over the events table
    sinks/      per-letter partitioned text sink (reference output parity)
"""

__version__ = "0.1.0"
