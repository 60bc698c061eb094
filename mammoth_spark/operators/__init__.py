from .compact import (
    InvalidActionSequenceError,
    compact_exact,
    compact_last_wins,
    compact_last_wins_flagged,
    net_kind_column,
)
from .flatten import change_flatten
from .merge import apply_changes, merge_upsert, merge_upsert_flagged
from .batch import (
    empty_tx_filter,
    group_by_relation,
    micro_batch_stats,
    offset_commit,
    tx_assemble,
)
from .verify import schema_diff, set_equality

__all__ = [
    "InvalidActionSequenceError",
    "compact_exact",
    "compact_last_wins",
    "compact_last_wins_flagged",
    "net_kind_column",
    "change_flatten",
    "apply_changes",
    "merge_upsert",
    "merge_upsert_flagged",
    "group_by_relation",
    "micro_batch_stats",
    "offset_commit",
    "tx_assemble",
    "empty_tx_filter",
    "schema_diff",
    "set_equality",
]
