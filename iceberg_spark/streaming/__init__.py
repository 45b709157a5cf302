from .maintenance_loop import MaintenanceScheduler, run_maintenance
from .micro_batch import MicroBatchStream, StreamingOffset
from .sinks import (
    append_sink,
    complete_overwrite_sink,
    equality_upsert_sink,
    upsert_sink,
    write_stream_to_table,
)

__all__ = [
    "MaintenanceScheduler",
    "MicroBatchStream",
    "StreamingOffset",
    "append_sink",
    "complete_overwrite_sink",
    "equality_upsert_sink",
    "run_maintenance",
    "upsert_sink",
    "write_stream_to_table",
]
