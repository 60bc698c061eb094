from .accumulator import assemble_transactions_stateful, validate_action_sequences
from .pipeline import ChangeLogPipeline, run_with_restart

__all__ = [
    "ChangeLogPipeline",
    "assemble_transactions_stateful",
    "validate_action_sequences",
    "run_with_restart",
]
