"""Sources & sinks (SURVEY.md §2.1): format I/O, table functions,
external-dictionary lookups."""

from clickhouse_23_3_19_32_lts_spark.sources.formats import (
    FORMAT_MAP,
    read_format,
    write_format,
)
from clickhouse_23_3_19_32_lts_spark.sources.table_functions import (
    generate_random,
    merge_tables,
    numbers,
    values_table,
    zeros,
)
from clickhouse_23_3_19_32_lts_spark.sources.dictionaries import (
    Dictionary,
    RangeHashedDictionary,
)

__all__ = [
    "FORMAT_MAP",
    "read_format",
    "write_format",
    "numbers",
    "zeros",
    "generate_random",
    "merge_tables",
    "values_table",
    "Dictionary",
    "RangeHashedDictionary",
]
