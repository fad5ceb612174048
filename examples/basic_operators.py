"""Stateless operator chain — reference examples/basic_noop.rs,
basic_operators.rs, custom_stateless_operator.rs: an in-memory
iterator source flows through map -> filter -> filter_map -> flatten
-> inspect into a collected sink."""

from pyspark.sql import functions as F

from malstrom_spark.sources import iterator_source
from malstrom_spark.stream import Stream


def main(spark):
    # SingleIteratorSource analog: ints 0..9, timestamp = index (seq)
    src = iterator_source(spark, range(10), "v long")
    s = Stream.from_df(src, ts_col="seq")
    out = (
        s.map({"doubled": F.col("v") * 2})                      # map.rs
        .filter(F.col("v") % 2 == 0)                            # filter.rs
        .filter_map({"half": F.col("doubled") / 2}, F.col("half") < 4)  # filter_map.rs
        .map({"pair": F.array(F.col("v"), F.col("doubled"))})
        .flatten("pair", "elem")                                # flatten.rs
        .inspect("seen")                                        # inspect.rs
    )
    rows = sorted((r.v, r.elem) for r in out.collect())
    # v in {0, 2} survive (half = v < 4); each explodes to (v, 2v)
    assert rows == [(0, 0), (0, 0), (2, 2), (2, 4)], rows
    return {"rows": len(rows)}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-basic")))
