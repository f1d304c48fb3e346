"""Ingest shim — record validation, timestamp stamping, landing append
(SURVEY.md §2.A A1/A2).

Parity target: the reference's logging server
(/root/reference/logging-server/server.py:42-93): validate the two query
params (54-61), stamp a second-precision wall-clock `ts` (64-68), JSON-
encode (70), fire-and-forget produce to the topic (75-81).  Here the
landing directory is the topic; with confluent-kafka/kafka-python present
(not in this container) `KafkaLandingWriter` produces to a real broker —
the engine-side stream reader is identical either way (streaming/sources).

This is upstream-of-engine glue (§3.1): deliberately tiny, no Spark
dependency, synchronous file append ≈ the reference's at-most-once
fire-and-forget posture.
"""

from __future__ import annotations

import json
import math
import os
import uuid
from datetime import datetime, timezone


class ValidationError(ValueError):
    pass


def make_record(event_type: str, value: str, now: datetime | None = None) -> dict:
    """Validate + stamp one event (server.py:54-68 semantics).

    `value` stays a STRING holding a numeric — the reference's stringly
    type contract (SURVEY.md §1.1); engines cast at query time."""
    if not event_type or not isinstance(event_type, str):
        raise ValidationError("event_type is required")
    if value is None:
        raise ValidationError("value is required")
    try:
        v = float(value)
    except (TypeError, ValueError):
        raise ValidationError(f"value must be numeric, got {value!r}")
    # float() accepts 'nan'/'inf'; one such record would turn its whole
    # (event_type, window) aggregate NaN downstream — reject it here
    if not math.isfinite(v):
        raise ValidationError(f"value must be finite, got {value!r}")
    ts = (now or datetime.now(timezone.utc)).strftime("%Y-%m-%d %H:%M:%S")
    return {
        "event_id": uuid.uuid4().hex,
        "event_type": event_type,
        "value": str(value),
        "ts": ts,
    }


class LandingWriter:
    """Append JSON-lines batches into the landing dir (the topic stand-in).

    One file per flush ≈ one produce batch; the streaming reader picks
    files up in mtime order."""

    def __init__(self, landing_dir: str):
        self.landing_dir = landing_dir
        os.makedirs(landing_dir, exist_ok=True)
        self._buf: list[dict] = []

    def log(self, event_type: str, value: str) -> dict:
        rec = make_record(event_type, value)
        self._buf.append(rec)
        return rec

    def flush(self) -> str | None:
        if not self._buf:
            return None
        path = os.path.join(self.landing_dir, f"ingest-{uuid.uuid4().hex}.json")
        # dot-prefixed tmp name: Spark's file source skips hidden files, so
        # the stream can never list the partial write (a visible .tmp would
        # be ingested half-written AND re-ingested after the rename)
        tmp = os.path.join(self.landing_dir, "." + os.path.basename(path) + ".tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(json.dumps(r) for r in self._buf))
        os.rename(tmp, path)  # atomic: the stream never sees partial files
        self._buf.clear()
        return path


class KafkaLandingWriter:
    """A2 with a real broker: fire-and-forget produce + poll(0), exactly the
    reference's posture (server.py:22-39,75-81).  ENV-gated: requires a
    Kafka client library and a broker, neither of which ships here."""

    def __init__(self, bootstrap_servers: str, topic: str):
        try:
            from confluent_kafka import Producer  # type: ignore
        except ImportError as e:  # pragma: no cover - env without kafka lib
            raise NotImplementedError(
                "KafkaLandingWriter needs confluent-kafka; use LandingWriter "
                "for the file-landing path"
            ) from e
        self._producer = Producer({"bootstrap.servers": bootstrap_servers})
        self._topic = topic

    def log(self, event_type: str, value: str) -> dict:  # pragma: no cover
        rec = make_record(event_type, value)
        self._producer.produce(self._topic, json.dumps(rec).encode("utf-8"))
        self._producer.poll(0)  # fire-and-forget + callback drain
        return rec
