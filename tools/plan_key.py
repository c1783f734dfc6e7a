"""Dump `.explain('formatted')` for named keys into plans/<round>/.

    python tools/plan_key.py --suffix after --out plans/r15 KEY [KEY...]

Build runs under ``lazy_checkpoints()`` (no checkpoint jobs at plan
time); the explain happens outside the guard so the dumped plan keeps
its production AQE shape. Run from any tree: paths resolve relative to
this file's repo.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--out", default="plans/r15")
    args = ap.parse_args()

    from spark_file_mover_spark import registry
    from spark_file_mover_spark.checkpoints import lazy_checkpoints
    from spark_file_mover_spark.session import get_spark

    registry.load_all()
    spark = get_spark("plankey", cpus=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    for key in args.keys:
        with lazy_checkpoints():
            df = registry.QUERIES[key](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(mode)
        path = outdir / f"{key}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
