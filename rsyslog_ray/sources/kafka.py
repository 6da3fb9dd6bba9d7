"""imkafka analog — a REAL Kafka consumer over the wire protocol.

The reference (plugins/imkafka/imkafka.c) subscribes via librdkafka
consumer groups and injects each message as a syslog line with the
topic recorded in metadata.  This batch-engine analog speaks the
public Kafka protocol itself (state/kafkawire.py: Fetch v4, magic-v2
record batches with verified CRC-32C) and reads a bounded offset
range per partition — offset checkpointing belongs to the engine's
lineage, not broker-side group state, exactly like every other capture
source here (sources/textlog.py TcpCapture).
"""

from __future__ import annotations

import pandas as pd

from ..state.kafkawire import KafkaFetchClient


class KafkaCapture:
    """Bounded consumer: ``capture(topic, partitions, start_offsets,
    max_records)`` fetches until each partition's high watermark (or
    the record cap) and returns a Dataset of
    (record, key, topic, partition, offset, timestamp) — imkafka.c's
    enqMsg shape, where the payload becomes MSG and topic/partition
    land in metadata."""

    def __init__(self, host: str, port: int, client_id: str = "raylog"):
        self.host = host
        self.port = port
        self.client_id = client_id

    def capture(self, topic: str, partitions: list[int],
                start_offsets: dict[int, int] | None = None,
                max_records: int = 1_000_000):
        import ray.data

        client = KafkaFetchClient(self.host, self.port, self.client_id)
        rows = {"record": [], "key": [], "topic": [], "partition": [],
                "offset": [], "timestamp": []}
        try:
            for pid in partitions:
                offset = (start_offsets or {}).get(pid, 0)
                while len(rows["record"]) < max_records:
                    records, next_off = client.fetch(topic, pid, offset)
                    if next_off == offset:
                        break  # caught up to the high watermark
                    offset = next_off
                    for rec in records:
                        rows["record"].append(
                            rec["value"].decode("utf-8", errors="replace"))
                        rows["key"].append(
                            rec["key"].decode("utf-8", errors="replace")
                            if rec["key"] is not None else None)
                        rows["topic"].append(topic)
                        rows["partition"].append(pid)
                        rows["offset"].append(rec["offset"])
                        rows["timestamp"].append(rec["timestamp"])
        finally:
            client.close()
        return ray.data.from_pandas(pd.DataFrame(rows))
