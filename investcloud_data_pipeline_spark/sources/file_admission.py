"""Byte-budgeted micro-batch file admission (``maxBytesPerTrigger``).

The reference caps each streaming trigger at "≤10 files and ≤10 GB"
(`databricks_notebooks/01_bronze_layer_ingestion.py:17-18`); OSS Spark's
file source only has ``maxFilesPerTrigger`` — files of wildly different
sizes make that a poor proxy for work-per-batch. This module closes the
gap with a Python Data Source stream reader (Spark 4 API) that admits
files per trigger under BOTH caps:

  spark.readStream.format("budget_files")
      .option("path", landing_dir)
      .option("maxBytesPerTrigger", "64MB")
      .option("maxFilesPerTrigger", "10")

Design (all public Spark concepts):

* **Admission order is lexicographic file name**, and the stream offset
  is simply the last admitted name (``{"pos": name}``). This is the same
  monotone-naming contract incremental file listing is documented to
  need (date-partitioned / ULID-style landing names): replay of
  ``(start, end]`` re-derives the exact file set from the sorted
  listing, and a late file sorting *before* the committed boundary is
  ignored rather than double-processed — exactly-once is by
  construction, with no unbounded file-log state anywhere.
* **At least one file is always admitted** when any file is pending, so
  a single file larger than the byte budget still makes progress
  (matching the file source's ``maxFilesPerTrigger`` semantics).
* **The scan stays executor-parallel**: ``partitions()`` emits one
  input partition per admitted file; executors read their file with
  pyarrow and hand Spark Arrow batches. The driver touches only file
  *names and sizes* (the listing), never row data — this is what makes
  the source usable at real scale, unlike a driver-side
  ``SimpleDataSourceStreamReader``.
* **Restart**: Spark's own offset/commit logs drive replay (it calls
  ``partitions(start, end)`` with checkpointed offsets), and
  ``partitions`` fast-forwards the planner past BOTH ends of every
  offset range the engine shows it (``max(planned, start, end)``) —
  so ``latestOffset`` is monotone w.r.t. every offset the engine has
  ever shown the reader, and the uncommitted-batch replay path (where
  Spark re-runs the logged range before asking for a new offset) can
  never regress planning. The subtle case is a restart whose LAST
  batch committed: the engine then asks ``latestOffset`` *before*
  showing the reader any offset, so the committed boundary must come
  from the reader's own sidecar (one line, ``{"pos": name}``). The
  sidecar is therefore (a) written both on ``commit()`` and whenever
  ``partitions()`` observes a higher boundary — covering the
  single-batch availableNow fallback, where the engine never invokes
  the Python ``commit()`` hook — and (b) relocatable via the
  ``stateLocation`` option. Place it INSIDE the checkpoint directory
  (``start_bronze`` and ``drain_backlog`` wire this) so it shares the
  checkpoint's durability domain: a sidecar that survives exactly
  when the checkpoint survives makes "stale sidecar + live
  checkpoint" — the one ordering that could re-admit an
  already-committed range — a non-event. With co-located state the
  worst a restart costs is one empty micro-batch, never duplicate
  rows; the legacy in-landing-dir default is kept only for
  checkpoint-free ad-hoc reads.

Parquet payloads only (the lake landing format here); the admission
mechanics are format-agnostic.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_STATE_FILE = "_admission_state"


def _parse_bytes(s: str) -> int:
    s = s.strip().lower()
    for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


class _FilePart(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _BudgetFileStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("budget_files requires option 'path'")
        self.max_bytes = _parse_bytes(options.get("maxbytespertrigger", "10gb"))
        self.max_files = int(options.get("maxfilespertrigger", "0")) or None
        # sidecar outside the landing dir when the caller provides a
        # stateLocation (landing dirs often have retention policies that
        # would silently delete a hint file living inside them)
        self._state_path = options.get(
            "statelocation", os.path.join(self.path, _STATE_FILE)
        )
        # Highest boundary this instance has planned or observed. "" sorts
        # before every real file name == "nothing admitted yet".
        self._planned: str = self._read_sidecar()
        # highest boundary durably written to the sidecar so far
        self._persisted: str = self._planned

    # -- listing ---------------------------------------------------------
    def _list_after(self, boundary: str) -> list[tuple[str, int]]:
        try:
            names = sorted(
                n
                for n in os.listdir(self.path)
                if not n.startswith("_") and not n.startswith(".")
            )
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n <= boundary:
                continue
            full = os.path.join(self.path, n)
            if os.path.isfile(full):
                out.append((n, os.path.getsize(full)))
        return out

    def _read_sidecar(self) -> str:
        try:
            with open(self._state_path) as fh:
                return json.load(fh).get("pos", "")
        except (OSError, ValueError):
            return ""

    # -- stream reader contract ------------------------------------------
    def initialOffset(self) -> dict:
        return {"pos": ""}

    def latestOffset(self) -> dict:
        pending = self._list_after(self._planned)
        admitted_bytes = 0
        boundary = self._planned
        for i, (name, size) in enumerate(pending):
            if self.max_files is not None and i >= self.max_files:
                break
            # always admit the first pending file, else a file larger
            # than the budget would wedge the stream forever
            if i > 0 and admitted_bytes + size > self.max_bytes:
                break
            admitted_bytes += size
            boundary = name
        self._planned = boundary
        return {"pos": boundary}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["pos"], end["pos"]
        # fast-forward past BOTH ends: after a restart Spark replans
        # from its offset log, and the checkpointed START offset is as
        # authoritative as the end — if the sidecar was stale/missing,
        # latestOffset may have proposed a boundary BEHIND the
        # committed one (the engine accepts backward offsets: its
        # comparison is equality, not order). Planning from
        # max(lo, hi) guarantees latestOffset never re-admits files in
        # an already-committed range as new work.
        observed = max(self._planned, lo, hi)
        self._planned = observed
        if observed > self._persisted:
            self._write_sidecar(observed)
        if hi <= lo:
            return []
        return [
            _FilePart(os.path.join(self.path, name))
            for name, _ in self._list_after(lo)
            if name <= hi
        ]

    def read(self, partition: _FilePart) -> Iterator[pa.RecordBatch]:
        yield from pq.ParquetFile(partition.path).iter_batches()

    def _write_sidecar(self, pos: str) -> None:
        # durable boundary hint (atomic rename), best-effort: the
        # checkpoint stays authoritative if this write is lost
        try:
            parent = os.path.dirname(self._state_path)
            if parent:
                os.makedirs(parent, exist_ok=True)
            tmp = self._state_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"pos": pos}, fh)
            os.replace(tmp, self._state_path)
            self._persisted = pos
        except OSError:
            pass

    def commit(self, end: dict) -> None:
        # restart resumes budget planning here instead of from the epoch
        self._write_sidecar(end["pos"])


class BudgetFilesDataSource(DataSource):
    """``budget_files``: parquet directory stream with byte + file caps."""

    @classmethod
    def name(cls) -> str:
        return "budget_files"

    def schema(self) -> str:
        # metadata-only footer read of the first listed file; an empty
        # directory needs an explicit .schema(...) from the caller
        path = self.options.get("path", "")
        try:
            names = sorted(
                n
                for n in os.listdir(path)
                if not n.startswith("_") and not n.startswith(".")
            )
            first = next(iter(names))
        except (OSError, StopIteration):
            raise ValueError(
                "budget_files cannot infer a schema from an empty dir; "
                "pass .schema(...) explicitly"
            ) from None
        import re

        arrow_schema = pq.read_schema(os.path.join(path, first))
        from pyspark.sql.pandas.types import from_arrow_schema

        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in from_arrow_schema(arrow_schema).fields
        )
        return re.sub(r"\s+", " ", ddl)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _BudgetFileStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register ``budget_files`` on this session."""
    spark.dataSource.register(BudgetFilesDataSource)


def drain_backlog(
    spark: SparkSession,
    path: str,
    out_path: str,
    checkpoint: str,
    max_bytes_per_trigger: str = "10gb",
    max_files_per_trigger: int = 0,
    max_rounds: int = 10_000,
) -> int:
    """Bounded-budget backlog catch-up: process every pending file in
    byte-capped batches, then stop. Returns the number of batches run.

    Spark's Python micro-batch sources do not implement
    ``Trigger.AvailableNow`` (the engine logs a single-batch fallback),
    so one ``availableNow`` start drains exactly ONE admitted batch.
    This helper turns that limitation into the intended semantics by
    looping single-batch runs against the SAME checkpoint until the
    committed admission boundary stops advancing — each round is
    exactly-once (checkpointed offsets + sidecar), so a crash mid-drain
    resumes where it left off.
    """
    register(spark)

    def boundary() -> str:
        """Committed admission boundary, read from Spark's own
        checkpoint (offsets/<n> line 3 is this source's offset JSON,
        for the highest n that also appears in commits/). The reader's
        sidecar is NOT authoritative here: under the single-batch
        fallback the engine stops without invoking the Python
        ``commit()`` hook."""
        try:
            commits = [
                int(n)
                for n in os.listdir(os.path.join(checkpoint, "commits"))
                if n.isdigit()
            ]
            if not commits:
                return ""
            with open(
                os.path.join(checkpoint, "offsets", str(max(commits)))
            ) as fh:
                lines = fh.read().splitlines()
            return json.loads(lines[2]).get("pos", "")
        except (OSError, ValueError, IndexError):
            return ""

    rounds = 0
    prev = boundary()
    while rounds < max_rounds:
        q = (
            spark.readStream.format("budget_files")
            .option("path", path)
            .option("maxBytesPerTrigger", max_bytes_per_trigger)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .option(
                "stateLocation", os.path.join(checkpoint, _STATE_FILE)
            )
            .load()
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        cur = boundary()
        if cur == prev:
            return rounds
        prev = cur
        rounds += 1
    raise RuntimeError(
        f"drain_backlog did not quiesce in {max_rounds} rounds — "
        "files may be arriving faster than the budget drains them"
    )
