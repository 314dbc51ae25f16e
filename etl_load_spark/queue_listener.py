"""Queue-triggered job control plane (S11) — the reference's PRIMARY entry
point: a listener consumes job-config JSON from a message queue and launches
the job (wfqueuelistener.java:130-155 Kafka @KafkaListener;
OracleAQListener.java:38-111 the Oracle AQ/JMS twin). Here the consumer is
a transport-pluggable poll loop over the same ``JobRegistry`` the REST API
uses, so queue- and REST-submitted jobs share one status surface and one
admission dedupe (duplicate RUNNING jobId refused,
wfqueuelistener.java:261-280).

Transports:
  - ``FileQueueTransport`` — a spool directory (``pending/`` → ``done/`` /
    ``failed/``). Zero dependencies, durable, and exactly the file-drop
    integration pattern ops teams wire cron/SFTP into; also the test
    stand-in for a broker.
  - ``KafkaTransport`` — kafka-python consumer with manual offset commit
    (gated behind an import-try: the client library isn't in this
    container; the class is the production slot).

Delivery contract — at-least-once, ack AFTER the guaranteed thing:
  - ``ack_after="completion"`` (default): the message is acknowledged only
    after ``run_job`` returns. A crash mid-job leaves the message pending →
    redelivered → re-run (idempotent sinks: overwrite / truncate-load /
    HWM-incremental make re-runs safe).
  - ``ack_after="launch"``: acknowledge once the job is validated and
    launched async — the reference's own semantics (@Async submitJob with
    Kafka auto-commit); job recovery is then the job store's concern.
  - Malformed JSON / invalid spec is a POISON message: acknowledged into
    ``failed/`` (redelivering it forever would wedge the queue — the
    reference logs-and-drops, wfqueuelistener.java:141-154).

Scale: the listener is control-plane only — one message per JOB, not per
row; the data path stays entirely inside Spark. Backpressure = stop
polling (pull model), which file spools and Kafka both give for free.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass

from etl_load_spark.api import JobRegistry


@dataclass
class QueueMessage:
    message_id: str
    payload: bytes
    #: transport-private handle used for acknowledgement
    handle: object = None


class FileQueueTransport:
    """Spool-directory queue: producers atomically drop ``*.json`` specs
    into ``pending/``; consumers claim by list order and ack by moving the
    file to ``done/`` (or ``failed/`` for poison). The move IS the ack —
    a crash before it leaves the message in ``pending`` for redelivery."""

    def __init__(self, root: str):
        self.root = root
        for d in ("pending", "done", "failed"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    # -- producer side -----------------------------------------------------
    def submit(self, spec_dict: dict) -> str:
        """Atomic enqueue (write-temp + rename): a consumer can never see a
        half-written spec."""
        name = f"{time.time_ns()}-{uuid.uuid4().hex[:8]}.json"
        pending = os.path.join(self.root, "pending")
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".enq_")
        with os.fdopen(fd, "w") as f:
            json.dump(spec_dict, f)
        os.replace(tmp, os.path.join(pending, name))
        return name

    # -- consumer side -----------------------------------------------------
    def poll(self, max_messages: int = 16) -> list[QueueMessage]:
        pending = os.path.join(self.root, "pending")
        out = []
        for name in sorted(os.listdir(pending))[:max_messages]:
            path = os.path.join(pending, name)
            try:
                with open(path, "rb") as f:
                    out.append(QueueMessage(name, f.read(), path))
            except OSError:
                continue  # claimed/removed by a concurrent consumer
        return out

    def ack(self, msg: QueueMessage, outcome: str = "done") -> None:
        dest = os.path.join(self.root, outcome, msg.message_id)
        try:
            os.replace(msg.handle, dest)
        except OSError:
            pass  # already acked (redelivery race) — at-least-once allows it


class KafkaTransport:
    """Kafka consumer transport (the reference's own trigger topology).

    Manual offset commit after processing = at-least-once. Requires
    kafka-python, which this container doesn't ship — the class import-
    gates so the engine stays usable without it, and tests exercise the
    listener through FileQueueTransport (same contract)."""

    def __init__(self, topic: str, bootstrap_servers: str,
                 group_id: str = "etl-load-listener", **consumer_kwargs):
        try:
            from kafka import KafkaConsumer  # type: ignore
        except ImportError as e:  # pragma: no cover - library absent here
            raise ImportError(
                "KafkaTransport requires the kafka-python package; install "
                "it or use FileQueueTransport") from e
        self._consumer = KafkaConsumer(  # pragma: no cover
            topic, bootstrap_servers=bootstrap_servers, group_id=group_id,
            enable_auto_commit=False, **consumer_kwargs)

    def poll(self, max_messages: int = 16):  # pragma: no cover
        batches = self._consumer.poll(timeout_ms=1000,
                                      max_records=max_messages)
        return [QueueMessage(f"{r.topic}-{r.partition}-{r.offset}", r.value, r)
                for recs in batches.values() for r in recs]

    def ack(self, msg, outcome: str = "done") -> None:  # pragma: no cover
        # commit THIS record's offset only (offset+1 = next to consume).
        # A bare commit() would commit the post-poll position for the whole
        # batch, acking messages not yet processed — a crash mid-batch
        # would then skip them, breaking at-least-once.
        from kafka import TopicPartition
        from kafka.structs import OffsetAndMetadata
        r = msg.handle
        try:
            # kafka-python ≥ 2.1 added a required leader_epoch field
            om = OffsetAndMetadata(r.offset + 1, "", -1)
        except TypeError:
            om = OffsetAndMetadata(r.offset + 1, "")
        self._consumer.commit({TopicPartition(r.topic, r.partition): om})


class QueueListener:
    """Poll loop: message → JSON job spec → admission → run → ack."""

    def __init__(self, spark, transport, ack_after: str = "completion",
                 registry: JobRegistry | None = None):
        if ack_after not in ("completion", "launch"):
            raise ValueError("ack_after must be 'completion' or 'launch'")
        self.transport = transport
        self.ack_after = ack_after
        self.registry = registry or JobRegistry(spark)
        self._stop = False

    def process_one(self, msg: QueueMessage) -> dict:
        try:
            spec_dict = json.loads(msg.payload)
            if not isinstance(spec_dict, dict):
                raise ValueError("job spec must be a JSON object")
        except (json.JSONDecodeError, ValueError) as e:
            self.transport.ack(msg, "failed")  # poison: never redeliver
            return {"messageId": msg.message_id, "status": "REJECTED",
                    "error": f"bad message: {e}"}
        if self.ack_after == "launch":
            code, payload = self.registry.submit(spec_dict)
            if code == 503:  # resource deferral: leave pending → redelivered
                return {"messageId": msg.message_id, **payload}
            self.transport.ack(msg, "done" if code == 202 else "failed")
        else:
            code, payload = self.registry.run_sync(spec_dict)
            if code == 503:
                return {"messageId": msg.message_id, **payload}
            ok = code == 200 and payload.get("status") == "COMPLETED"
            self.transport.ack(msg, "done" if ok else "failed")
        return {"messageId": msg.message_id, **payload}

    def drain(self, max_messages: int | None = None) -> list[dict]:
        """Process until the queue is empty (or max_messages); returns the
        per-message outcomes. The batch-mode entry for tests/cron.

        Deferred messages (admission control, U10) stay un-acked in the
        queue; a poll round that only defers makes no progress, so drain
        returns and the next cycle retries — the spool IS the waiting
        room."""
        results = []
        while not self._stop:
            budget = 16 if max_messages is None \
                else max_messages - len(results)
            if budget <= 0:
                break
            msgs = self.transport.poll(budget)
            if not msgs:
                break
            round_results = [self.process_one(m) for m in msgs]
            results.extend(round_results)
            if all(r.get("status") == "DEFERRED" for r in round_results):
                break
        return results

    def run_forever(self, poll_interval: float = 2.0) -> None:
        """The daemon loop (CLI ``listen``). ``stop()`` ends it."""
        while not self._stop:
            if not self.drain():
                time.sleep(poll_interval)

    def stop(self) -> None:
        self._stop = True
