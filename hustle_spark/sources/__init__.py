from .readers import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_json_events,
    read_jsonl,
    read_orc,
    read_parquet_table,
    write_jsonl,
    write_orc,
)
