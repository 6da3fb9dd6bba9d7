"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
a deterministic sf0.001 pages table (the BASELINE.json input_hint
shape, synthesized under /tmp — the driver's testdata has no pages
table).  ``queries()`` / ``oracle_sql()`` expose one entry per
implemented operator from SURVEY.md §2 over the driver's testdata
views.  Ray is initialised by the driver — nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on synthesized sf0.001 pages; returns the
    per-sink dynstats aggregate (sink, kind, key, cnt)."""
    import tempfile

    from rsyslog_ray import gen
    from rsyslog_ray.pipelines.flagship import run_flagship

    pages = gen.pages_dir(0.001)
    gen.ensure_pages(0.001)
    out = tempfile.mkdtemp(prefix="rsyslog_ray_entry_")
    return run_flagship(pages, out, resume=False, lineage=False)


def queries() -> dict[str, Callable[[str], Any]]:
    from rsyslog_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rsyslog_ray.pipelines.queries import SQL

    return dict(SQL)
