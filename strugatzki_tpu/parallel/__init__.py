"""Multi-chip scaling: resident serving databases, mesh sweeps,
sequence-parallel traces/extraction, multi-host initialization."""

from .database import FeatureDatabase, PunchQueryResult, QueryResult
from .multihost import global_files_mesh, initialize
from .sweep import (batched_correlation_traces, batched_novelty_traces,
                    make_files_mesh, pad_stack, sharded_extract_long,
                    sharded_long_file_trace, sharded_sweep_step)

__all__ = [
    "FeatureDatabase", "QueryResult", "PunchQueryResult",
    "make_files_mesh", "global_files_mesh", "initialize",
    "batched_correlation_traces", "batched_novelty_traces",
    "sharded_sweep_step", "pad_stack",
    "sharded_long_file_trace", "sharded_extract_long",
]
