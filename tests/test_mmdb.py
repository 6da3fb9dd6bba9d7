"""MaxMind DB binary-format reader (mmdblookup analog,
plugins/mmdblookup/mmdblookup.c:470-497) against hand-built fixtures
written by the in-repo spec-conformant writer."""

import pandas as pd
import pytest

from rsyslog_ray.state.mmdb import METADATA_MARKER, MMDBReader, build_mmdb

NETS = {
    "10.0.0.0/8": {"country": {"iso_code": "AA",
                               "names": {"en": "Alpha"}},
                   "location": {"latitude": 1.5, "accuracy": 100},
                   "is_anycast": True},
    "192.168.7.0/24": {"country": {"iso_code": "BB",
                                   "names": {"en": "Beta"}}},
    "8.8.8.8/32": {"country": {"iso_code": "CC", "names": {"en": "Gamma"}},
                   "asn": 15169},
}


@pytest.mark.parametrize("record_size", [24, 28, 32])
def test_mmdb_roundtrip_all_record_sizes(record_size, tmp_path):
    blob = build_mmdb(NETS, record_size=record_size)
    assert blob.count(METADATA_MARKER) >= 1
    p = tmp_path / f"t{record_size}.mmdb"
    p.write_bytes(blob)
    r = MMDBReader(str(p))
    assert r.metadata["record_size"] == record_size
    assert r.metadata["ip_version"] == 4
    assert r.metadata["binary_format_major_version"] == 2
    assert r.metadata["database_type"] == "Raylog-Test"
    assert r.metadata["description"] == {"en": "raylog test fixture"}

    # hits across the whole network range, including boundaries
    assert r.get("10.0.0.0")["country"]["iso_code"] == "AA"
    assert r.get("10.255.255.255")["country"]["names"]["en"] == "Alpha"
    got = r.get("10.1.2.3")
    assert got["location"] == {"latitude": 1.5, "accuracy": 100}
    assert got["is_anycast"] is True
    assert r.get("192.168.7.44")["country"]["iso_code"] == "BB"
    assert r.get("8.8.8.8")["asn"] == 15169
    # misses: outside every network, the /24 sibling, invalid input
    assert r.get("11.0.0.0") is None
    assert r.get("192.168.8.1") is None
    assert r.get("8.8.8.9") is None
    assert r.get("not-an-ip") is None
    assert r.get("::1") is None               # v6 probe into a v4 tree

    # dotted-field batch probe with stub for misses
    vals = r.lookup_series(["10.9.9.9", "1.2.3.4", "192.168.7.1"],
                           field="country.iso_code")
    assert vals == ["AA", "", "BB"]


def test_mmdb_through_enrich_actor(ray_session, tmp_path):
    """The open-once shape: MMDBReader constructed in a map_batches
    class __init__ (one tree parse per actor — wrkr_reopen_mmdb
    analog), probed per batch."""
    import ray.data

    p = tmp_path / "geo.mmdb"
    p.write_bytes(build_mmdb(NETS))

    class GeoStage:
        def __init__(self, path):
            self.db = MMDBReader(path)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["iso"] = self.db.lookup_series(df["ip"],
                                              field="country.iso_code")
            return df

    ds = ray.data.from_pandas(pd.DataFrame({
        "ip": ["10.0.0.1", "192.168.7.200", "8.8.8.8", "203.0.113.9"]}))
    out = (ds.map_batches(GeoStage, fn_constructor_args=(str(p),),
                          batch_format="pandas", concurrency=(1, 2))
           .to_pandas())
    assert out["iso"].tolist() == ["AA", "BB", "CC", ""]


def test_mmdb_enrich_stage(ray_session, tmp_path):
    import ray.data

    from rsyslog_ray.stages.enrich import MmdbEnrichStage

    p = tmp_path / "geo.mmdb"
    p.write_bytes(build_mmdb(NETS))
    ds = ray.data.from_pandas(pd.DataFrame({
        "src_ip": ["10.1.1.1", "8.8.8.8", "0.0.0.0"]}))
    out = (ds.map_batches(
        MmdbEnrichStage,
        fn_constructor_args=(str(p), "src_ip",
                             {"iso": "country.iso_code",
                              "cname": "country.names.en"}),
        batch_format="pandas", concurrency=(1, 2)).to_pandas())
    assert out["iso"].tolist() == ["AA", "CC", ""]
    assert out["cname"].tolist() == ["Alpha", "Gamma", ""]
