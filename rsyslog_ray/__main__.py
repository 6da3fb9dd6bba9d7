"""CLI — run a declarative pipeline config (the rsyslogd invocation
analog): ``python -m rsyslog_ray --config pipeline.json``.

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
    ap.add_argument("--config", required=True,
                    help="pipeline config JSON (see rsyslog_ray/config.py)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess everything, ignore the lineage manifest")
    ap.add_argument("--no-lineage", action="store_true",
                    help="skip per-partition lineage commits")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

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
