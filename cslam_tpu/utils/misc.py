"""Misc helpers (reference cslam/utils/misc.py parity)."""

from typing import Dict, List


def clamp(value, low, high):
    """Clamp value into [low, high] (misc.py clamp)."""
    return max(low, min(value, high))


def dict_to_list_chunks(d: Dict, start_idx: int, chunk_size: int) -> List[list]:
    """Values of a key-sorted dict from start_idx onward, in chunks
    (misc.py:21-33 — used to batch gossip publications)."""
    values = [d[k] for k in sorted(d.keys())]
    values = values[max(start_idx, 0):]
    return [values[i:i + chunk_size]
            for i in range(0, len(values), chunk_size)]
