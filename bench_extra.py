"""Round-7 optimization measurement harness (bench.py stays FROZEN).

Times individual declared queries with the exact methodology of
bench.py's query leg (same get_spark session config, same
``.count()`` action), but adds what iteration needs:

- ``--filter a,b,c``  time a subset (default: all operator queries)
- ``--repeats N``     run each query N times, report every sample +
                      the min (host noise is one-sided: best-of-k
                      approaches the noise-free value from below)
- ``--explain DIR``   additionally write ``DIR/<name>.txt`` with the
                      ``.explain('formatted')`` physical plan
- ``--suffix S``      plan file suffix (e.g. ``_before`` / ``_after``)

Prints one JSON line: {"queries": {name: [s, ...]}, "min": {...}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

NON_OPERATOR_QUERIES = {
    "streaming_router_parity",
    "streaming_unique_starts",
    "csv_sink_roundtrip",
    "json_sink_roundtrip",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default=None)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from s3_log_parser_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if args.filter:
        names = [n for n in qs if n in set(args.filter.split(","))]
    else:
        names = [n for n in qs if n not in NON_OPERATOR_QUERIES]

    samples: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        for r in range(args.repeats):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.count()
            samples.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            if args.explain and r == 0:
                os.makedirs(args.explain, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(
                        args.explain, f"{name}{args.suffix}.txt"
                    ),
                    "w",
                ) as f:
                    f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "queries": samples,
                "min": {k: min(v) for k, v in samples.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
