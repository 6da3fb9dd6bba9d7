"""CLI — run a declarative pipeline config (the rsyslogd invocation
analog): ``python -m rsyslog_ray --config pipeline.json``, or run
one catalog operator over a table directory:
``python -m rsyslog_ray --query ngram_topk --sf-dir /data/sf0.01
[--out out.parquet] [--limit 20]``.

Owns its Ray session (guarded init + shutdown); library code never
initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="rsyslog_ray",
        description="Ray-Data-native parse→enrich→route→aggregate engine")
    ap.add_argument("--config",
                    help="pipeline config JSON (see rsyslog_ray/config.py)")
    ap.add_argument("--query",
                    help="run one catalog operator (pipelines.queries "
                         "QUERIES name; --list-queries to enumerate)")
    ap.add_argument("--list-queries", action="store_true",
                    help="print the catalog names and exit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table directory for --query")
    ap.add_argument("--out", help="write --query result to this parquet "
                                  "path instead of printing")
    ap.add_argument("--limit", type=int, default=20,
                    help="rows to print for --query (default 20)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess everything, ignore the lineage manifest")
    ap.add_argument("--no-lineage", action="store_true",
                    help="skip per-partition lineage commits")
    args = ap.parse_args(argv)

    if args.list_queries:
        from .pipelines.queries import QUERIES
        print("\n".join(QUERIES))
        return 0
    if not args.config and not args.query:
        ap.error("one of --config / --query / --list-queries is required")

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    if args.query:
        from .pipelines.queries import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; --list-queries to "
                  f"enumerate", file=sys.stderr)
            ray.shutdown()
            return 2
        res = QUERIES[args.query](args.sf_dir)
        import pandas as pd
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if args.out:
            df.to_parquet(args.out)
            print(json.dumps({"status": "complete", "rows": len(df),
                              "out": args.out}))
        else:
            print(df.head(args.limit).to_string())
            print(json.dumps({"status": "complete", "rows": len(df)}))
        ray.shutdown()
        return 0

    from .config import run_config

    agg = run_config(args.config, resume=not args.no_resume,
                     lineage=not args.no_lineage)
    print(json.dumps({
        "status": "complete",
        "aggregate_rows": len(agg),
        "sinks": sorted(agg["sink"].unique().tolist()) if len(agg) else [],
        "total_delivered": int(agg[agg["kind"] == agg["kind"].iloc[0]]
                               ["cnt"].sum()) if len(agg) else 0,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
