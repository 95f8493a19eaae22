"""Sources and sinks: batch readers/writers plus connector adapters."""

from azuredataengineering_deeplearning_spark.sources.readers import (
    read_parquet,
    read_json,
    read_csv,
    load_tables,
    TABLE_NAMES,
)
from azuredataengineering_deeplearning_spark.sources.writers import (
    write_parquet,
    write_jsonl,
    write_delta,
)

__all__ = [
    "read_parquet",
    "read_json",
    "read_csv",
    "load_tables",
    "TABLE_NAMES",
    "write_parquet",
    "write_jsonl",
    "write_delta",
]
