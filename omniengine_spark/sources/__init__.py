"""Sources: table catalog + readers (SURVEY §2.1)."""

from omniengine_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    stream_table,
)

__all__ = ["TABLES", "load_table", "load_tables", "stream_table"]
