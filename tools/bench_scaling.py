"""Two-cluster-size scaling evidence (north rule, sandbox proxy):

Runs jobs/extract_bench.py via spark-submit --py-files at local[8] and
local[32] on the same input, reports throughput at both and efficiency
= (throughput@32 / throughput@8) / 4. Writes BENCH_scaling.json.

Usage: python tools/bench_scaling.py [--reps 40] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from article_extraction_spark.session import make_pyfiles_zip  # noqa: E402


def run_once(cores: int, sf_dir: str, reps: int, zip_path: str) -> dict:
    """One spark-submit run pinned to exactly ``cores`` CPUs.

    taskset is load-bearing for honesty: an unpinned local[4] JVM still uses
    all machine CPUs for GC/shuffle/python workers, inflating the small-
    cluster baseline. A real N-core executor has N cores for everything.
    """
    spark_submit = shutil.which("spark-submit")
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=24g",
        "--py-files", zip_path,
        "/root/repo/jobs/extract_bench.py",
        "--sf-dir", sf_dir,
        "--reps", str(reps),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "turns_per_sec" in line:
            return json.loads(line)
    raise RuntimeError(f"no result line; stderr tail:\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    zip_path = make_pyfiles_zip("/tmp/article_extraction_spark.zip")
    r_small = run_once(args.small, args.sf_dir, args.reps, zip_path)
    print(f"local[{args.small}]: {r_small}")
    r_large = run_once(args.large, args.sf_dir, args.reps, zip_path)
    print(f"local[{args.large}]: {r_large}")

    factor = args.large / args.small
    eff = (r_large["turns_per_sec"] / r_small["turns_per_sec"]) / factor
    result = {
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "small": r_small,
        "large": r_large,
        "scale_factor": factor,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open("/root/repo/BENCH_scaling.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
