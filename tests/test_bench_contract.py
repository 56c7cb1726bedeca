"""Driver-contract tests for bench.py's stdout shape.

VERDICT r5 #1: the driver parses only the LAST ~2,000 chars of bench.py's
stdout; BENCH_r05 landed ``parsed: null`` because the single JSON line
outgrew that window. bench.py now prints the full blob early (plus the
BENCH_full.json sidecar) and a compact headline line LAST. These tests pin
the compact line's worst-case size without running Spark.
"""

from __future__ import annotations

import ast
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, os.pardir, "bench.py")

# The fixed headline set (round-over-round comparable; see bench.py).
HEADLINE = [
    "extract_transcripts",
    "convert_html",
    "left_join_counts",
    "latest_order_per_customer",
    "desc_stats",
    "topk_orders",
    "cumulative_mean",
    "parse_numeric",
    "token_counts",
    "fingerprint",
    "cosine_topk",
    "minhash_near_dups",
    "simhash_near_dups",
    "media_features",
    "pii_redaction",
    "contamination",
]


def _headline_names_from_source() -> list[str]:
    """Parse the headline query list out of bench.py so this test fails
    loudly if the set grows past what the size bound was computed for."""
    with open(BENCH) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        # the `for name in [...]` loop over headline queries
        if (
            isinstance(node, ast.For)
            and isinstance(node.iter, ast.List)
            and isinstance(node.target, ast.Name)
            and node.target.id == "name"
        ):
            names = [ast.literal_eval(e) for e in node.iter.elts]
            if "convert_html" in names:
                return ["extract_transcripts"] + names
    raise AssertionError("headline query list not found in bench.py")


def test_headline_set_is_pinned():
    assert _headline_names_from_source() == HEADLINE


def test_compact_line_fits_driver_tail_window():
    # Worst-case values: wide floats in both timing blocks.
    timings = {n: 9999.999 for n in HEADLINE}
    compact = {
        "metric": "headline_suite_seconds",
        "value": 99999.999,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "cpus": 32,
        "warm_min5": dict(timings),
        "warm_min5_total": 99999.999,
        "extract_turns_per_sec": 9999999.9,
        "extract_turns_per_sec_warm": 9999999.9,
        "full": "BENCH_full.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1800, len(line)


def test_bench_source_has_inline_guard():
    # bench.py itself must assert the line length before printing, so a
    # future key addition cannot silently regress the driver contract.
    with open(BENCH) as f:
        src = f.read()
    assert re.search(r"assert len\(line\) < 1800", src)
    assert "BENCH_full.json" in src
