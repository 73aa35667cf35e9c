"""Schema tracking + evolution for file-stream ingest (Auto Loader
parity, reference 01:15-16).

Databricks Auto Loader persists an inferred schema to
``cloudFiles.schemaLocation`` and evolves it when new columns appear
(the stream stops, the schema file is updated, the restarted stream
reads old + new files). OSS file-source streams require an explicit
schema — this module supplies the same contract portably:

* ``track_schema(spark, data_dir, schema_location)`` — infer the
  current schema from the files present, merge it with the previously
  tracked schema (new columns appended, numeric types widened), persist
  the merge atomically, and return it. Parquet scans tolerate missing
  columns (null-filled), so a stream started on the merged schema reads
  pre-evolution files correctly.
* ``read_stream_evolving(...)`` — file-source stream using the tracked
  schema; re-invoking after new-column files landed returns a stream
  that carries the evolved schema, matching Auto Loader's
  stop-update-restart ``addNewColumns`` mode.

Scale: inference reads parquet FOOTERS (metadata), not data — cost is
O(files), and production deployments point ``mergeSchema``-style
inference at the most recent landing partition only. The tracked-schema
file is tiny JSON; the atomic rename makes concurrent trackers safe.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Numeric widening lattice (smaller index promotes to larger).
_WIDENING = ["byte", "short", "integer", "long", "float", "double"]


def _merge_field(old: T.StructField, new: T.StructField) -> T.StructField:
    if old.dataType == new.dataType:
        return old
    o, n = old.dataType.typeName(), new.dataType.typeName()
    if o in _WIDENING and n in _WIDENING:
        wider = _WIDENING[max(_WIDENING.index(o), _WIDENING.index(n))]
        return T.StructField(old.name, getattr(T, f"{wider.capitalize()}Type")())
    raise ValueError(
        f"incompatible evolution for column '{old.name}': "
        f"{o} -> {n} (only numeric widening and new columns are supported)"
    )


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Old column order is preserved; genuinely new columns append at the
    end (Auto Loader's addNewColumns); same-name columns must be equal
    or numerically widenable."""
    by_name = {f.name: f for f in new.fields}
    fields = [
        _merge_field(f, by_name[f.name]) if f.name in by_name else f
        for f in old.fields
    ]
    seen = {f.name for f in old.fields}
    fields += [f for f in new.fields if f.name not in seen]
    return T.StructType(fields)


def _schema_file(schema_location: str) -> str:
    return os.path.join(schema_location, "tracked_schema.json")


def load_tracked_schema(schema_location: str) -> T.StructType | None:
    path = _schema_file(schema_location)
    if not os.path.isfile(path):
        return None
    with open(path) as fh:
        return T.StructType.fromJson(json.load(fh))


def track_schema(
    spark: SparkSession, data_dir: str, schema_location: str, fmt: str = "parquet"
) -> T.StructType:
    """Infer from current files, merge with the tracked schema, persist
    atomically, return the merged schema."""
    if fmt == "parquet":
        # mergeSchema: union all footers — a plain read takes a single
        # file's footer and would miss columns added by newer files.
        inferred = spark.read.option("mergeSchema", "true").parquet(data_dir).schema
    elif fmt == "csv":
        inferred = (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(data_dir)
            .schema
        )
    else:
        raise ValueError(f"unsupported format: {fmt}")
    tracked = load_tracked_schema(schema_location)
    merged = merge_schemas(tracked, inferred) if tracked else inferred
    os.makedirs(schema_location, exist_ok=True)
    tmp = _schema_file(schema_location) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(merged.jsonValue(), fh)
    os.replace(tmp, _schema_file(schema_location))
    return merged


def read_stream_evolving(
    spark: SparkSession,
    data_dir: str,
    schema_location: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream on the tracked (auto-evolving) schema. Restart
    the stream through this function after new columns land — the same
    stop-update-restart cycle Auto Loader's addNewColumns mode uses."""
    schema = track_schema(spark, data_dir, schema_location, fmt=fmt)
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(data_dir)
