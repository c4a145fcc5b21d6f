"""Sources: corpus synthesis + catalog seam (parquet locally, Iceberg on cluster)."""

from .corpus import (
    RAW_FILES_SELECT,
    synth_raw_files,
    duckdb_raw_files_cte,
    IS_CODE_SQL,
    IS_PAGE_SQL,
    TITLE_ID_SQL,
    CANON_ID_SQL,
)
from .catalog import load_table, write_table

__all__ = [
    "RAW_FILES_SELECT",
    "synth_raw_files",
    "duckdb_raw_files_cte",
    "IS_CODE_SQL",
    "IS_PAGE_SQL",
    "TITLE_ID_SQL",
    "CANON_ID_SQL",
    "load_table",
    "write_table",
]
