"""Dump .explain("formatted") for the headline bench queries into
plans/r08/<name>_{before|after}.txt (round-8 optimization evidence).

Usage: python tools/dump_plans_r08.py before|after [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from article_extraction_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "convert_html", "left_join_counts", "latest_order_per_customer",
    "desc_stats", "topk_orders", "cumulative_mean", "parse_numeric",
    "token_counts", "fingerprint", "cosine_topk", "minhash_near_dups",
    "simhash_near_dups", "media_features", "pii_redaction", "contamination",
]


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "first arg must be before|after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    spark = get_spark(app_name=f"plans-r08-{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)

    qs = entry.queries()
    for name in HEADLINE:
        if only and name not in only:
            continue
        try:
            p = plan_str(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            p = f"ERROR building plan: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)
        print(f"wrote {name}_{tag}.txt ({len(p)} chars)")

    # flagship: the extraction pipeline over the amplified corpus
    if not only or "extract_transcripts" in only:
        from article_extraction_spark.fixtures.synth import amplified_transcripts
        from article_extraction_spark.pipeline import convert_transcripts

        t = amplified_transcripts(spark, sf_dir, reps=2)
        p = plan_str(convert_transcripts(t, num_partitions=8))
        with open(os.path.join(out_dir, f"extract_transcripts_{tag}.txt"), "w") as f:
            f.write(p)
        print(f"wrote extract_transcripts_{tag}.txt ({len(p)} chars)")


if __name__ == "__main__":
    main()
