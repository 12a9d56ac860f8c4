"""Physical-plan inspection and contract helpers.

The scale story of every operator rests on plan properties — filters
pushed into the parquet scan, small sides broadcast, a bounded number of
shuffles, codegen covering the hot path. These helpers turn those
properties into assertable contracts so a regression (a lost broadcast
hint, a filter that stopped pushing down, an accidental extra exchange)
fails a unit test instead of surfacing as a 10× slowdown at 100 TB.
"""

from .inspect import (
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    read_schemas,
    wholestage_codegen_ids,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "wholestage_codegen_ids",
]
