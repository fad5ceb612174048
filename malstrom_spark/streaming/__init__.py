from . import stateful
from .replay import replay_table

__all__ = ["stateful", "replay_table"]
