"""Catalog smoke: EVERY queries() entry (driver window + rows-only
tail) runs end-to-end at sf0.001 and yields a non-degenerate frame.
The driver gate only exercises the first 50 at sf0.01 and the tail
otherwise runs nowhere but bench — this is the tail's cheap seatbelt
(~70 s on the 4-cpu session; one entry failing names itself)."""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# entries whose result is legitimately EMPTY at this tiny scale (the
# schema must still be stable); everything else must yield rows
EMPTY_OK = {"ratelimit_summary"}   # nobody exceeds the burst at 0.001


def _names():
    from rsyslog_ray.pipelines.queries import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_catalog_entry_runs(ray_session, name):
    from rsyslog_ray.pipelines.queries import QUERIES

    res = QUERIES[name](SF_DIR)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    assert len(df.columns) >= 1, name
    if name not in EMPTY_OK:
        assert len(df) >= 1, name
