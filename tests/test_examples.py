"""Smoke-run every examples/ module (reference test layer 4: runnable
examples double as integration tests, SURVEY §5). Each example asserts
its own expected output and returns a summary; the test just drives
`main(spark)` on the shared session."""

import importlib

import pytest

EXAMPLES = [
    "basic_operators",
    "keyed_stateful_programs",
    "split_join_cloned",
    "event_time",
    "custom_operators",
    "file_source_sink",
    "recovery",
    "rescaling",
    "look_ma_im_streaming",
    "training_pipeline",
    "message_bus",
    "streaming_corpus_ingest",
    "temporal_analytics",
    "out_of_order_streams",
    "ann_serving",
    "incremental_dedup",
    "crawl_ingest",
    "crawl_frontier_restart",
    "cdc_apply",
    "bpe_tokenizer",
    "search_serving",
    "bitext_mining",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name, tmp_path):
    mod = importlib.import_module(f"examples.{name}")
    import inspect

    kwargs = {}
    if "tmp_dir" in inspect.signature(mod.main).parameters:
        kwargs["tmp_dir"] = str(tmp_path / name)
    out = mod.main(spark, **kwargs)
    assert isinstance(out, dict) and out
