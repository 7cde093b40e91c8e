"""Smoke test for examples/readme_pipeline.py — the reference ReadMe's
input → process → output pipeline (ReadMe.org:38-63) in one flow:
stored-function deployment over the control bus, fixed admission cap,
sliding lossy buffer, dead-letter quarantine, and the documented
inc-before/dec-after hot-swap semantics."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_readme_pipeline(spark, tmp_path):
    from readme_pipeline import main

    out = main(workdir=str(tmp_path), spark=spark)

    # pre-swap: inc applied; sliding buffer kept only app a's newest 5
    # of 7 (ts 3..7), both of b's rows survive (under capacity)
    assert out["pre_swap"] == [
        ("a", 3, 104),
        ("a", 4, 105),
        ("a", 5, 106),
        ("a", 6, 107),
        ("a", 7, 108),
        ("b", 1, 201),
        ("b", 2, 202),
    ]
    # post-swap: dec applied (old-before/new-after, ReadMe.org:64)
    assert out["post_swap"] == [("a", 10, 299), ("b", 10, 399)]
    # the malformed row went to the dead letter, not the output
    assert out["dead_letters"] == [("bad", 99)]
