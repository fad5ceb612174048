"""Streaming CDC apply — the unbounded twin of
operators/cdc.py:cdc_compact (reference stateful_map semantics,
malstrom-core stateful_map.rs: per-key state overwritten by each
event; here the state IS the latest change image). Each microbatch
folds its events into per-key (ts, tiebreak)-max state and emits the
key's current image, so a downstream batch `cdc_compact` over the
emission log yields the snapshot REGARDLESS of how the stream was
batched — state carries the latest image across batches, making the
final answer batching-invariant (the property the gate row checks
against the batch oracle).

State per key is ONE image (the latest), never history — constant
size per key, the textbook stream-compaction footprint. Timestamps
must arrive as comparable numerics (cast timestamps to epoch micros
first): applyInPandasWithState state columns round-trip exactly for
longs, and integer comparisons keep latest-wins deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from .stateful import stateful_map_stream


def cdc_snapshot_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-microbatch, per-key emission of the latest change image.
    Input columns: key + ts (numeric) + seq (numeric tiebreak) + any
    payload (op included — delete filtering happens downstream so a
    late revival can still win). Output schema == input schema, one
    row per key per microbatch that touched it."""
    import numpy as np
    import pandas as pd

    cols = sdf.columns
    if key_col not in cols or ts_col not in cols or seq_col not in cols:
        raise ValueError(
            f"cdc_snapshot_stream: need {key_col}/{ts_col}/{seq_col} "
            f"columns, have {cols}"
        )
    rest = [c for c in cols if c != key_col]
    ts_i, seq_i = rest.index(ts_col), rest.index(seq_col)
    out_schema = sdf.schema
    state_schema = StructType([f for f in sdf.schema.fields
                               if f.name != key_col])

    def fn(key, pdfs, state):
        best = tuple(state) if state is not None else None
        for pdf in pdfs:
            n = len(pdf)
            if n == 0:
                continue
            # vectorized lexicographic argmax on (ts, seq): this fn
            # runs once PER KEY, so its constant factor is the
            # operator's floor, and np.lexsort stays O(n log n) C-side
            # even for a hot key that takes 100k events in one batch
            tsv = pdf[ts_col].to_numpy()
            sqv = pdf[seq_col].to_numpy()
            bi = int(np.lexsort((sqv, tsv))[-1])
            top = pdf.iloc[bi]
            cand = tuple(
                None if pd.isna(top[c]) else top[c] for c in rest
            )
            if best is None or (cand[ts_i], cand[seq_i]) > (
                best[ts_i], best[seq_i]
            ):
                best = cand
        if best is None:
            return [], None
        out = pd.DataFrame(
            [[key[0]] + list(best)], columns=[key_col] + rest
        ).astype(object)
        return [out], best

    return stateful_map_stream(sdf, [key_col], fn, out_schema, state_schema)
