from .resume import CheckpointManifest, run_resumable
from .ingest import read_pages_stream, start_extract_stream

__all__ = [
    "CheckpointManifest",
    "run_resumable",
    "read_pages_stream",
    "start_extract_stream",
]
