"""Deterministic activity-log generator.

Same data contract as the reference's ``data_generator/data_generator.py``
(log_id `log_` + 9 digits :31, 5000-user pool :24, 765-IP pool :21-23,
watch_time uniform [1,120) :35, timestamps over the trailing ~69 days :33,
~10% duplicate log_ids capped at 500/file :37-41) — but fully seeded so
tests are reproducible, with an optional dirty-row injection mode to
exercise the DQ quarantine path (nulls / negative watch time / unparseable
timestamps, the validity predicate at reference 01:39-45).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

USER_POOL = 5000
IP_POOL = (
    [f"192.168.1.{i}" for i in range(255)]
    + [f"10.0.0.{i}" for i in range(255)]
    + [f"172.16.0.{i}" for i in range(255)]
)
# Fixed anchor instead of wall-clock `datetime.now()` so output is stable.
ANCHOR = datetime(2024, 3, 1, 0, 0, 0)


HOT_USER = "user_00007"


def make_activity_frame(
    rows: int,
    seed: int = 42,
    dup_fraction: float = 0.1,
    dup_cap: int = 500,
    dirty_fraction: float = 0.0,
    hot_user_fraction: float = 0.0,
) -> pd.DataFrame:
    """One file's worth of activity rows as pandas (generator-shaped).

    ``hot_user_fraction`` > 0 reassigns that share of rows to ONE user
    (``HOT_USER``) — the adversarial hot-key shape for the streaming
    skew benchmark (one user owning ~50% of the stream), leaving log_id
    / ip / timestamp distributions untouched so the DQ and dedup layers
    see the same workload.
    """
    rng = np.random.default_rng(seed)
    log_ids = np.array([f"log_{n:09d}" for n in rng.integers(0, 10**9, rows)])
    ts = [
        (ANCHOR - timedelta(minutes=int(m))).isoformat()
        for m in rng.integers(1, 100_000, rows)
    ]
    df = pd.DataFrame(
        {
            "log_id": log_ids,
            "user_id": [f"user_{u:05d}" for u in rng.integers(0, USER_POOL, rows)],
            "timestamp": ts,
            "ip_address": rng.choice(IP_POOL, rows),
            "watch_time(min)": rng.integers(1, 120, rows).astype("int64"),
        }
    )
    if hot_user_fraction:
        hot_idx = rng.random(rows) < hot_user_fraction
        df.loc[hot_idx, "user_id"] = HOT_USER
    n_dups = min(int(rows * dup_fraction), dup_cap)
    if n_dups and rows > 1:
        # Overwrite a suffix with full copies of prefix rows — exact
        # duplicates, like re-delivered records (the reference injects
        # duplicate log_ids; full-row copies keep dedup outcome
        # payload-deterministic regardless of which instance survives).
        src = rng.integers(0, rows - n_dups, n_dups)
        df.iloc[rows - n_dups :] = df.iloc[src].values
    if dirty_fraction:
        n_dirty = max(1, int(rows * dirty_fraction))
        idx = rng.choice(rows, n_dirty, replace=False)
        kinds = rng.integers(0, 4, n_dirty)
        df["watch_time(min)"] = df["watch_time(min)"].astype("object")
        for i, kind in zip(idx, kinds):
            if kind == 0:
                df.loc[i, "log_id"] = None
            elif kind == 1:
                df.loc[i, "user_id"] = None
            elif kind == 2:
                df.loc[i, "timestamp"] = "not-a-timestamp"
            else:
                df.loc[i, "watch_time(min)"] = -5
    return df


def write_activity_files(
    out_dir: str,
    num_files: int = 3,
    rows_per_file: int = 1000,
    seed: int = 42,
    fmt: str = "parquet",
    dirty_fraction: float = 0.0,
    start_index: int = 0,
    hot_user_fraction: float = 0.0,
) -> list[str]:
    """Write N activity files (csv or parquet) into ``out_dir``.

    Cross-file duplicates arise naturally because each file draws log_ids
    from the same 10^9 space with overlapping seeds — plus the explicit
    intra-file injection above.

    ``start_index`` offsets the file names: streaming file sources track
    processed files BY NAME, so a second wave written into a watched
    directory must not reuse wave-one names (an overwritten file is
    silently treated as already processed).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(num_files):
        df = make_activity_frame(
            rows_per_file,
            seed=seed + i,
            dirty_fraction=dirty_fraction,
            hot_user_fraction=hot_user_fraction,
        )
        path = os.path.join(out_dir, f"activity_{start_index + i:04d}.{fmt}")
        if fmt == "csv":
            df.to_csv(path, index=False)
        else:
            df.to_parquet(path, index=False)
        paths.append(path)
    return paths


def make_ip_region_frame(seed: int = 7, unknown_gap: float = 0.05) -> pd.DataFrame:
    """Deterministic IP→region dimension (seeded fix for the reference's
    import-time ``random.choice`` nondeterminism, 00_utils.py:49-51).

    ``unknown_gap`` leaves a fraction of pool IPs unmapped so the
    'Unknown' default path (00_utils.py:57) is exercised.
    """
    from .config import REGIONS

    rng = np.random.default_rng(seed)
    keep = rng.random(len(IP_POOL)) >= unknown_gap
    ips = [ip for ip, k in zip(IP_POOL, keep) if k]
    return pd.DataFrame(
        {"ip_address": ips, "region": rng.choice(REGIONS, len(ips))}
    )
