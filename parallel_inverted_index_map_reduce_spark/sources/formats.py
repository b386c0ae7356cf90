"""Source/sink format round-trips beyond parquet: CSV, JSON-lines, ORC.

The reference reads whitespace-tokenized text files and writes a bespoke
text format; a complete engine also ingests/emits the standard columnar
interchange formats. These helpers are deliberately thin wrappers over
``spark.read``/``DataFrame.write`` — the value is the pinned options
(explicit schema, no inference surprises, UTC timestamps) and the tests
that prove lossless round-trips for every table in the test schema.

At 100 TB: CSV/JSON are ingest-only edges; data should land in parquet
(or a table format) after the first pass — write_* here exist for
export interoperability, not as the persistent store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# TIMESTAMP and TIMESTAMP_NTZ columns are formatted by two independent
# options; pinning only timestampFormat silently truncates NTZ columns
# (e.g. events.ts) to the default millisecond precision on write.
CSV_OPTIONS = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "nullValue": "\\N",
    "escape": '"',
}

JSONL_OPTIONS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**CSV_OPTIONS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.options(**CSV_OPTIONS).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**JSONL_OPTIONS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.options(**JSONL_OPTIONS).schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC is columnar + typed, so no format options to pin — the
    round-trip hazard is TIMESTAMP semantics, which the tests assert
    instead (ORC stores both TIMESTAMP and TIMESTAMP_NTZ natively)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)
