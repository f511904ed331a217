"""File-spool sink: an MqttAlertSink-shaped client that writes payloads to
per-task files instead of a broker. Used as (a) the executor-side test
double for publish_partitions (worker effects are observed through the
filesystem), and (b) a broker-less debug sink for local topology runs.
Lives in the engine package so Spark workers can unpickle it by import.
"""

from __future__ import annotations

import os


class FileSpoolSink:
    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        self.published: list[str] = []

    def publish(self, payload: str) -> None:
        self.published.append(payload)

    def publish_all(self, payloads) -> int:
        self.published.extend(payloads)
        return len(self.published)

    def close(self) -> None:
        if self.published:
            os.makedirs(self.spool_dir, exist_ok=True)
            path = os.path.join(
                self.spool_dir, f"task-{os.getpid()}-{id(self)}.txt"
            )
            with open(path, "w") as f:
                f.write("\n".join(self.published))
            self.published = []
