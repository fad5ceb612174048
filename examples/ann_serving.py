"""TWO-JOB persisted-IVF serving (the ANN analog of the persist_stage
continuous-aggregate pattern): job 1 — the INDEXING job — fits the
quantizer and writes cell assignments partitioned by list_id; job 2 —
the SERVING job, typically a different process hours later — loads
only the quantizer (k x dim floats, driver-small) and answers query
batches by scanning ONLY the probed cell directories via partition
pruning. The corpus is never re-scanned and never re-assigned at
serving time; at 100 TB the serving job reads ~n_probe/n_lists of the
index bytes and nothing else.

No reference analog (the reference has no ANN surface) — this is part
of the LLM-pipeline layer. Ranks are asserted identical to the
in-memory `ivf_topk` with the same centroids."""

import json
import os

from pyspark.sql import functions as F

from malstrom_spark.functions import similarity
from malstrom_spark.queries import table


def indexing_job(spark, sf_dir, index_dir):
    """Job 1: fit quantizer, persist assignments + centroids."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    cents = similarity.ivf_build_centroids(corpus, "c_vec", n_lists=8, n_iters=2)
    similarity.ivf_write_assignments(corpus, cents, f"{index_dir}/cells")
    # the quantizer is the ONLY state the serving job needs beyond the
    # parquet cells: persist it next to them (k x dim floats)
    with open(f"{index_dir}/centroids.json", "w") as f:
        json.dump(cents, f)
    return cents


def serving_job(spark, sf_dir, index_dir, k=3, n_probe=2):
    """Job 2: load quantizer, answer a query batch off the pruned
    cells. Knows nothing about job 1 except the index directory."""
    with open(f"{index_dir}/centroids.json") as f:
        cents = json.load(f)
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return queries, similarity.ivf_topk_partitioned(
        spark, f"{index_dir}/cells", queries, cents, k=k, n_probe=n_probe
    )


def main(spark, sf_dir=None, tmp_dir=None):
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    index_dir = tmp_dir or "/tmp/malstrom_example_ann_index"

    cents = indexing_job(spark, sf_dir, index_dir)

    queries, served = serving_job(spark, sf_dir, index_dir)
    got = {(r.q_id, r.rank): r.c_id for r in served.collect()}
    assert got, "serving job returned no neighbors"

    # the serving plan must prune to the probed cells only
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "list_id" in pf, f"serving scan did not prune cells: {pf}"

    # parity with the in-memory path on the same quantizer
    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    want = {
        (r.q_id, r.rank): r.c_id
        for r in similarity.ivf_topk(
            queries, corpus, k=3, n_lists=8, n_probe=2, centroids=cents
        ).collect()
    }
    assert got == want, "persisted serving diverged from in-memory IVF"

    # ---- job 3: nightly index MAINTENANCE (round 12) — a re-embed
    # batch (every 3rd vector gets a new embedding; one NULL-vector
    # tombstone) plus an explicit delete set update the persisted
    # assignments via delete-and-replace (update_ivf_assignments,
    # same float quantizer engine that built the index), and serving
    # from the updated cells equals a from-scratch rebuild over the
    # updated vector set — no stale neighbors, no lost vectors.
    cells = spark.read.parquet(f"{index_dir}/cells")
    fresh = corpus.where(F.col("c_id") % 3 == 0).select(
        "c_id",
        F.when(F.col("c_id") == 0, F.lit(None).cast(corpus.schema["c_vec"].dataType))
        .otherwise(F.reverse("c_vec"))
        .alias("c_vec"),
    )
    deleted = corpus.where(F.col("c_id") == 1).select("c_id")
    updated = similarity.update_ivf_assignments(
        cells, fresh, cents, deleted_ids=deleted
    )
    updated.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{index_dir}/cells_v2"
    )
    rebuilt_corpus = (
        corpus.where((F.col("c_id") % 3 != 0) & (F.col("c_id") != 1))
        .unionByName(fresh.where(F.col("c_vec").isNotNull()))
    )
    q3 = queries.where(F.col("q_id") >= 2)  # 0 tombstoned, 1 deleted
    served_v2 = similarity.ivf_topk_partitioned(
        spark, f"{index_dir}/cells_v2", q3, cents, k=3, n_probe=2
    )
    similarity.ivf_write_assignments(rebuilt_corpus, cents, f"{index_dir}/cells_rebuilt")
    rebuilt_serve = similarity.ivf_topk_partitioned(
        spark, f"{index_dir}/cells_rebuilt", q3, cents, k=3, n_probe=2
    )
    got_v2 = {(r.q_id, r.rank): r.c_id for r in served_v2.collect()}
    want_v2 = {(r.q_id, r.rank): r.c_id for r in rebuilt_serve.collect()}
    assert got_v2 == want_v2 and got_v2, "maintained index diverged from rebuild"
    assert not {0, 1} & set(got_v2.values()), "tombstoned/deleted id served"

    # ---- IVFADC tier: the same two-job pattern with PQ codes ----
    # job 1b: fit per-subspace codebooks, persist (c_id, cell, codes)
    # partitioned by cell — 8 one-byte codes per vector instead of 64
    # floats; at 100 TB this is the index that stays hot
    from malstrom_spark.functions import pq

    books = pq.pq_fit_codebooks(corpus, "c_vec", 64, m=8, k=16, n_iters=2)
    coded = pq.pq_encode(
        similarity.with_nearest_list(corpus, "c_vec", cents, "cell"),
        "c_vec", books, 64,
    ).select("c_id", "cell", "codes")
    coded.write.mode("overwrite").partitionBy("cell").parquet(f"{index_dir}/codes")
    with open(f"{index_dir}/codebooks.json", "w") as f:
        json.dump(books, f)

    # job 2b: serve off the persisted codes + quantizers only
    with open(f"{index_dir}/codebooks.json") as f:
        books2 = json.load(f)
    codes_idx = spark.read.parquet(f"{index_dir}/codes")
    served_pq = pq.ivf_pq_topk_encoded(
        queries, codes_idx, cents, books2, 64, k=3, n_probe=4,
        refine=10, refine_corpus=corpus,
    )
    got_pq = {(r.q_id, r.rank): r.c_id for r in served_pq.collect()}
    # the refined top-1 is the exact self-match (sim 1.0)
    assert all(got_pq[(q, 1)] == q for q in range(4)), got_pq
    # parity with the in-memory IVFADC on the same quantizers
    want_pq = {
        (r.q_id, r.rank): r.c_id
        for r in pq.ivf_pq_topk(
            queries, corpus, 64, k=3, n_probe=4, refine=10,
            centroids=cents, codebooks=books2,
        ).collect()
    }
    assert got_pq == want_pq, "persisted IVFADC diverged from in-memory"

    # ---- hierarchical tier (round 12): the same two-job pattern at
    # corpus-scaled n_lists, where FLAT assignment is the quadratic
    # term (BASELINE round-12 #3). The two-level quantizer persists as
    # plain JSON like the flat one (supers + leaves + leaf->super map);
    # write/serve/maintain all take the HierQuantizer directly, and
    # the on-disk layout is identical (global leaf ids).
    hq = similarity.ivf_build_hier_centroids(corpus, "c_vec", n_lists=9, n_iters=1)
    with open(f"{index_dir}/hier_quantizer.json", "w") as f:
        json.dump({"supers": hq.supers, "leaves": hq.leaves,
                   "leaf_super": hq.leaf_super}, f)
    similarity.ivf_write_assignments(corpus, hq, f"{index_dir}/cells_hier")
    with open(f"{index_dir}/hier_quantizer.json") as f:
        hq2 = similarity.HierQuantizer(**json.load(f))
    served_hier = similarity.ivf_topk_partitioned(
        spark, f"{index_dir}/cells_hier", queries, hq2, k=3, n_probe=2,
        n_probe_super=2,
    )
    got_hier = {(r.q_id, r.rank): r.c_id for r in served_hier.collect()}
    want_hier = {
        (r.q_id, r.rank): r.c_id
        for r in similarity.ivf_topk_hier(
            queries, corpus, k=3, n_probe=2, n_probe_super=2, hq=hq2
        ).collect()
    }
    assert got_hier == want_hier and got_hier, (
        "persisted hier serving diverged from in-memory"
    )

    return {
        "n_lists": len(cents),
        "neighbors_served": len(got),
        "partition_pruned": True,
        "maintained_equals_rebuild": True,
        "pq_neighbors_served": len(got_pq),
        "pq_self_hit_rank1": True,
        "hier_neighbors_served": len(got_hier),
    }


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-ann-serving")))
