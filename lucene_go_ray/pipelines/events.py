"""Event-stream style aggregates over the ``events`` table.

The reference engine is batch-only (SURVEY.md §2.10) — these operators are
part of the training-data-pipeline extension surface: a tumbling-window
aggregate and gap-based sessionization, both expressed Dataset-first.

- window counts: pre-combine inside ``map_batches`` (per-batch partial
  aggregation over (user, window)), then a small ``groupby().aggregate``
  over partial rows — the exchange is proportional to distinct
  (user, window) pairs, never to event count;
- sessionization: ``groupby(user_id).map_groups`` — the per-key ordered
  scan that defines a session cannot be split below the key, so the user
  is the partitioning key (documented assumption: one user's events fit a
  worker; salt heavy users by day if that ever breaks).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_US_PER_SEC = 1_000_000


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def tumbling_window_counts(sf_dir: str, window_seconds: int = 3600):
    """(user_id, window_start [epoch seconds], n_events, sum_value)."""
    import ray.data

    win_us = window_seconds * _US_PER_SEC

    def _partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // win_us) * window_seconds
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": pa.array(win, type=pa.int64()),
                "value": batch["value"],
            }
        )
        agg = t.group_by(["user_id", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "window_start": agg["window_start"],
                "n_events": agg["value_count"].cast(pa.int64()),
                "sum_value": agg["value_sum"],
            }
        )

    ds = ray.data.read_parquet(
        _events_path(sf_dir), columns=["ts", "user_id", "value"]
    )
    # final combine over partial rows via the vectorized pair-keyed
    # reduction (dedup.pair_groupby) — Ray's multi-column groupby
    # aggregate measured 20x slower on the same row counts
    from .dedup import pair_groupby

    def _reduce(a, b, starts, sizes, values):
        return pa.table(
            {
                "user_id": pa.array(a),
                "window_start": pa.array(b),
                "n_events": pa.array(
                    np.add.reduceat(values["n_events"], starts)
                    if len(starts)
                    else np.empty(0, np.int64)
                ),
                "sum_value": pa.array(
                    np.add.reduceat(values["sum_value"], starts)
                    if len(starts)
                    else np.empty(0, np.float64)
                ),
            }
        )

    out = pair_groupby(
        ds.map_batches(_partial, batch_format="pyarrow").rename_columns(
            {"user_id": "a", "window_start": "b"}
        ),
        _reduce,
        value_cols=("n_events", "sum_value"),
    )

    def _round(batch: pa.Table) -> pa.Table:
        sv = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            pa.array(sv, type=pa.float64()),
        )

    return out.map_batches(_round, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_seconds: int = 1800):
    """Gap-based sessions: (user_id, session_id, n_events, session_start_us).

    ``session_id`` is the 0-based ordinal of the session within the user's
    (ts, event_id)-ordered event stream; a new session starts when the gap
    to the previous event exceeds ``gap_seconds``."""
    import ray.data

    gap_us = gap_seconds * _US_PER_SEC

    def _sessions(group: pa.Table) -> pa.Table:
        us = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us))
        us = us[order]
        brk = np.ones(len(us), dtype=np.int64)
        brk[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        n = np.diff(np.append(starts, len(us)))
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid, dtype=np.int64)),
                "session_id": pa.array(np.arange(len(starts), dtype=np.int64)),
                "n_events": pa.array(n, type=pa.int64()),
                "session_start_us": pa.array(us[starts], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        _events_path(sf_dir), columns=["ts", "user_id", "event_id"]
    )
    return ds.groupby("user_id").map_groups(_sessions, batch_format="pyarrow")
