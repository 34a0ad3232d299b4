from .latest_wins import latest_by_key, latest_value
from .hll_state import hll_partial_state, hll_merge_estimate

__all__ = [
    "latest_by_key",
    "latest_value",
    "hll_partial_state",
    "hll_merge_estimate",
]
