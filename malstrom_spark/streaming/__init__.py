from . import dedup, stateful
from .replay import replay_table

__all__ = ["dedup", "stateful", "replay_table"]
