"""Runnable examples mirroring the reference's examples/ surface
(malstrom-core/examples/*.rs — its test layer 4, SURVEY §5): each
module's `main(spark)` builds the same program the named reference
example builds, runs it to completion, asserts the expected output,
and returns a small summary dict. `python -m examples.<name>` runs one
standalone; tests/test_examples.py smoke-runs them all.
"""
