"""Multi-stream topology — reference examples/split_streams.rs,
cloned_streams.rs, joining_streams.rs: split one stream into routed
substreams, clone a stream to two consumers, and merge streams with
union (the reference's only stream combinator — real joins are native
here, SURVEY §2.8)."""

from pyspark.sql import functions as F

from malstrom_spark.sources import iterator_source
from malstrom_spark.stream import Stream


def main(spark):
    s = Stream.from_df(iterator_source(spark, range(10), "v long"), ts_col="seq")

    evens, odds = s.split(F.col("v") % 2 == 0, F.col("v") % 2 == 1)  # split.rs
    assert sorted(r.v for r in evens.collect()) == [0, 2, 4, 6, 8]
    assert sorted(r.v for r in odds.collect()) == [1, 3, 5, 7, 9]

    a, b = s.cloned(2)  # cloned.rs: both consumers see every record
    assert sorted(r.v for r in a.collect()) == sorted(r.v for r in b.collect())

    merged = evens.union(odds)  # joining_streams.rs ("joining" = union)
    assert sorted(r.v for r in merged.collect()) == list(range(10))

    # and the native join the reference lacks: evens against odds+1
    shifted = odds.map({"v": F.col("v") + 1}).select("v")
    joined = evens.select("v").join(shifted, on="v")
    assert sorted(r.v for r in joined.collect()) == [2, 4, 6, 8, 10][:4]
    return {"merged": 10}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-split")))
