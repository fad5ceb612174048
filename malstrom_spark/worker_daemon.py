"""PySpark worker daemon with the heavyweight libraries PRELOADED
(round-12 session 4).

The stock daemon (`pyspark.daemon`) forks a fresh worker per task
slot; each Arrow/pandas stage's worker then imports numpy + pandas +
pyarrow on first use — ~0.7 s wall / ~4.4 s cpu PER WORKER on this
host. A query chaining three mapInPandas stages holds THREE workers
per task, so 32 tasks spawn ~96 workers at once while the reuse pool
only keeps one per core: the import storm was measured adding
10-40 s to the first pass of video_frame_phash in a long bench
session (ps sampling: 38 -> 131 python processes at the query
boundary, all in the import phase).

Importing the libraries HERE — in the daemon, before any fork —
makes every forked worker inherit the already-initialized modules
via copy-on-write: no per-worker import, no storm. This is the
documented purpose of ``spark.python.daemon.module`` and is
scale-neutral: on any cluster size the daemon pays the import once
per executor instead of once per worker.

The imports are best-effort: a worker that needs an absent library
fails exactly as it would have without preloading.
"""

try:  # pragma: no cover - trivial imports
    import numpy  # noqa: F401
except ImportError:
    pass
try:  # pragma: no cover
    import pandas  # noqa: F401
except ImportError:
    pass
try:  # pragma: no cover
    import pyarrow  # noqa: F401
except ImportError:
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
