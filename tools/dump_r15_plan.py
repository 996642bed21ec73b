"""Dump `.explain("formatted")` for registry queries into plans/r15/.

Usage: python tools/dump_r15_plan.py <query> [...] [--suffix=before|after]

Optimization-round deliverable tooling (guide §1/§7.2): the judge
cannot run Spark, so every touched query's before/after physical plan
is committed as plans/r15/<query>_<suffix>.txt. Lifecycle queries run
their side effects during construction; the dumped plan is the final
serving read — exactly what the bench times through the noop sink.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    os.makedirs(OUT, exist_ok=True)

    from psd_project_spark.session import get_spark
    from psd_project_spark.registry import queries

    spark = get_spark(app_name="psd-plan")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
