from .manifest import (
    atomic_write_bytes,
    atomic_write_json,
    read_json,
    segment_manifest_path,
    segment_is_done,
)

__all__ = [
    "atomic_write_bytes",
    "atomic_write_json",
    "read_json",
    "segment_manifest_path",
    "segment_is_done",
]
