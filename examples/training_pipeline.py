"""The north-star composition (no reference analog — this is what the
engine is FOR): prepare a training corpus end to end in one
declarative plan. Exact dedup -> quality + language gates -> 13-gram
benchmark decontamination -> fixed-length sequence packing, on the
driver's documents table."""

import os

from malstrom_spark.queries import full_registry


def main(spark, sf_dir=None):
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    fn = full_registry()["training_data_pipeline_scale"].fn
    packed = fn(spark, sf_dir)
    rows = packed.collect()
    assert rows, "pipeline produced no packed documents"
    seqs = {(r.shard, r.seq_id) for r in rows}
    crossing = sum(r.crosses_boundary for r in rows)
    return {
        "docs_packed": len(rows),
        "sequences": len(seqs),
        "boundary_crossers": crossing,
    }


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-training")))
