"""rsyslog_ray — a from-scratch, Ray-Data-native log/telemetry engine.

Re-expresses the query & data-processing capabilities of rsyslog
(reference at /root/reference, rgerhards/rsyslog) as streaming batch
pipelines over ``ray.data.Dataset``:

- parse   — vectorized first-match-wins rule chains (parser chain /
            liblognorm analog, reference runtime/parser.c:613-693,
            plugins/mmnormalize/mmnormalize.c)
- enrich  — broadcast lookup tables (reference runtime/lookup.c) held in
            actor-pool state
- route   — predicate router with fan-out + stop semantics (reference
            runtime/ruleset.c:536-640)
- aggregate — keyed counts / percentiles with partial pre-aggregation
            (reference runtime/dynstats.c, runtime/perctile_stats.c)
- deliver — resumable partitioned Parquet sinks with per-partition
            lineage + metrics (reference queue checkpoints,
            runtime/queue.c:104-160)

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, or the test fixture).
"""

__version__ = "0.1.0"
