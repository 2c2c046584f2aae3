from .checkpoint import (
    export_ply,
    import_ply,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from .logging import MetricLogger, named_scope, profile_trace

__all__ = [
    "MetricLogger",
    "export_ply",
    "import_ply",
    "latest_step",
    "named_scope",
    "profile_trace",
    "restore_checkpoint",
    "save_checkpoint",
]
