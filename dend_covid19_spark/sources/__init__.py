"""Sources and sinks (SURVEY.md §2.1)."""

from .ddl import (  # noqa: F401
    create_serving_tables,
    drop_serving_tables,
    reset_serving_tables,
)
from .readers import (  # noqa: F401
    external_timeseries,
    from_rows,
    read_jsonl,
    read_partitioned,
    write_jsonl,
    write_partitioned,
)
