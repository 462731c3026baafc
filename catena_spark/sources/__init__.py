"""Storage & ingest (SURVEY.md §2-A): catena's storage engine recast on
Spark primitives — partitioned Parquet replaces mmap'd extent files, SS
checkpoints replace the WAL, directory deletes replace retention, a
rewrite job replaces compaction."""

from .encodings import (  # noqa: F401
    detect_byte_stream_split,
    enable_bitrot_detection,
    merged_drifted_schema,
    mitigate_byte_stream_split,
    read_drifted,
)
from .ingest import (  # noqa: F401
    compact,
    partition_stats,
    retain_latest,
    stream_ingest_events,
    write_partitioned,
)
