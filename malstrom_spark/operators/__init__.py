from . import asof, eventtime, keyed, stateful, stateless, windows

__all__ = ["asof", "eventtime", "keyed", "stateful", "stateless", "windows"]
