"""Event-stream style aggregates over the ``events`` table.

The reference engine is batch-only (SURVEY.md §2.10) — these operators are
part of the training-data-pipeline extension surface: a tumbling-window
aggregate and gap-based sessionization, both expressed Dataset-first.

- window counts: pre-combine inside ``map_batches`` (per-batch partial
  aggregation over (user, window)), then a small ``groupby().aggregate``
  over partial rows — the exchange is proportional to distinct
  (user, window) pairs, never to event count;
- sessionization: salted two-level plan — pre-sessionize per
  (user, day-bucket) in a vectorized pair_groupby, then stitch boundary
  sessions per user over SESSION rows, so a heavy user's exchange weight
  is O(their sessions), never O(their events).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def sessionize(
    sf_dir: str, gap_seconds: int = 1800, *, salt_seconds: int = 86_400
):
    """Gap-based sessions: (user_id, session_id, n_events, session_start_us).

    ``session_id`` is the 0-based ordinal of the session within the user's
    (ts, event_id)-ordered event stream; a new session starts when the gap
    to the previous event exceeds ``gap_seconds``.

    Salted two-level plan (a bot user with 10^9 events must NOT land on
    one worker as raw events):

    1. pre-sessionize per (user, time-bucket of ``salt_seconds``) — a
       vectorized ``pair_groupby`` whose reduce scans ALL of a bucket's
       groups in one lexsort + run-length pass, emitting LOCAL sessions
       (user, start_us, end_us, n_events);
    2. stitch per user over the local-SESSION rows — sessions that touch
       a bucket boundary merge when the cross-boundary gap is within
       ``gap_seconds`` (two local sessions in the same bucket are >gap
       apart by construction, so only boundary adjacency can merge).

    Per-user memory in step 2 is O(sessions), not O(events) — the heavy
    user's exchange weight collapses by their events-per-session factor.
    (Degenerate bound: a user whose every event is its own session still
    carries O(events) rows — that is the size of the OUTPUT itself.)
    """
    import ray.data

    from .dedup import pair_groupby

    gap_us = gap_seconds * _US_PER_SEC
    salt_us = salt_seconds * _US_PER_SEC

    def _project(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": batch["user_id"],
                "b": pa.array(us // salt_us, type=pa.int64()),
                "us": pa.array(us, type=pa.int64()),
                "eid": batch["event_id"],
            }
        )

    def _local_sessions(a, b, starts, sizes, values) -> pa.Table:
        # one vectorized pass over every (user, bucket) group in this
        # shuffle bucket: order within groups by (ts, event_id), then
        # run-length the gap breaks
        if not len(starts):
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        group_of = np.repeat(np.arange(len(starts)), sizes)
        us, eid = values["us"], values["eid"]
        order = np.lexsort((eid, us, group_of))
        us, g = us[order], group_of[order]
        brk = np.ones(len(us), dtype=bool)
        brk[1:] = (g[1:] != g[:-1]) | (us[1:] - us[:-1] > gap_us)
        sess_start = np.flatnonzero(brk)
        sess_end = np.append(sess_start[1:], len(us)) - 1
        return pa.table(
            {
                "user_id": pa.array(a[g[sess_start]], type=pa.int64()),
                "start_us": pa.array(us[sess_start], type=pa.int64()),
                "end_us": pa.array(us[sess_end], type=pa.int64()),
                "n_events": pa.array(
                    sess_end - sess_start + 1, type=pa.int64()
                ),
            }
        )

    def _stitch(group: pa.Table) -> pa.Table:
        st = group["start_us"].to_numpy(zero_copy_only=False)
        en = group["end_us"].to_numpy(zero_copy_only=False)
        ne = group["n_events"].to_numpy(zero_copy_only=False)
        order = np.lexsort((en, st))
        st, en, ne = st[order], en[order], ne[order]
        brk = np.ones(len(st), dtype=bool)
        brk[1:] = st[1:] - en[:-1] > gap_us
        heads = np.flatnonzero(brk)
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(len(heads), uid, dtype=np.int64)),
                "session_id": pa.array(np.arange(len(heads), dtype=np.int64)),
                "n_events": pa.array(
                    np.add.reduceat(ne, heads) if len(heads) else ne,
                    type=pa.int64(),
                ),
                "session_start_us": pa.array(st[heads], type=pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        _events_path(sf_dir), columns=["ts", "user_id", "event_id"]
    )
    local = pair_groupby(
        ds.map_batches(_project, batch_format="pyarrow"),
        _local_sessions,
        value_cols=("us", "eid"),
    )
    return local.groupby("user_id").map_groups(
        _stitch, batch_format="pyarrow"
    )


def funnel_counts(
    sf_dir: str,
    steps: tuple = ("view", "click", "purchase"),
    within_seconds: int = 3600,
):
    """Funnel analysis — how many users complete the ordered step
    sequence: per user, the GREEDY-EARLIEST chain (earliest step-1 event,
    then the earliest step-2 event strictly after it, ...) with the whole
    chain inside ``within_seconds`` of the step-1 anchor. Returns one row
    per funnel prefix: (step_idx, step, n_users). Greedy-earliest is the
    deterministic, SQL-expressible convention (a self-join chain of
    min()s reproduces it exactly).

    Shape: the read keeps only the step event types and (user_id, type,
    ts); ONE groupby(user) exchange; the per-bucket kernel resolves every
    user's chain with vectorized searchsorted per step (sorted once per
    bucket, no per-user loop). Heavy users cost O(their events) — no
    pairwise blowup — so no salting is needed (contrast sessionize)."""
    import ray.data

    step_ix = {s: i for i, s in enumerate(steps)}
    within_us = int(within_seconds) * 1_000_000

    def _project(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch["event_type"],
            value_set=pa.array(list(steps), type=pa.string()),
        )
        t = batch.filter(keep)
        six = pc.index_in(
            t["event_type"], value_set=pa.array(list(steps), pa.string())
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "six": six.cast(pa.int32()),
                "us": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    def _chains(group: pa.Table) -> pa.Table:
        n_steps = len(steps)
        empty = pa.table(
            {"depth": pa.array([], pa.int32()),
             "cnt": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        six = group["six"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = group["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        users, ucode = np.unique(u, return_inverse=True)
        nu = len(users)
        # rank-pack (user code, time rank) so every step's "earliest event
        # of this user strictly after cur" is ONE vectorized searchsorted
        # (no per-user loop): events sit at odd packed slots, probes at
        # even slots just past their time rank
        uu = np.unique(us)
        R = np.int64(len(uu) + 2)
        ev_rank = np.searchsorted(uu, us).astype(np.int64)
        cur = np.full(nu, np.int64(-1))  # current chain time
        alive = np.ones(nu, dtype=bool)
        depth = np.zeros(nu, dtype=np.int64)
        anchor = np.zeros(nu, dtype=np.int64)
        for s in range(n_steps):
            m = six == s
            uc_s, us_s, rk_s = ucode[m], us[m], ev_rank[m]
            packed_ev = (uc_s * R + rk_s) * 2 + 1
            o = np.argsort(packed_ev, kind="stable")
            packed_ev, us_s, uc_s = packed_ev[o], us_s[o], uc_s[o]
            # probe: first distinct time strictly greater than cur
            pr = np.searchsorted(uu, cur, side="right").astype(np.int64)
            packed_pr = (np.arange(nu, dtype=np.int64) * R + pr) * 2
            pos = np.searchsorted(packed_ev, packed_pr)
            safe = np.minimum(pos, len(packed_ev) - 1)
            ok = alive & (pos < len(packed_ev)) & (
                uc_s[safe] == np.arange(nu)
            ) if len(packed_ev) else np.zeros(nu, dtype=bool)
            t_next = np.where(ok, us_s[safe] if len(us_s) else 0, 0)
            if s == 0:
                anchor = t_next
            else:
                ok &= (t_next - anchor) <= within_us
            alive = ok
            cur = np.where(ok, t_next, cur)
            depth[ok] = s + 1
        cnt = np.bincount(depth, minlength=n_steps + 1)
        # n_users reaching at least step i
        reach = np.cumsum(cnt[::-1])[::-1]
        return pa.table(
            {
                "depth": pa.array(
                    np.arange(1, n_steps + 1, dtype=np.int32)
                ),
                "cnt": pa.array(reach[1:].astype(np.int64)),
            }
        )

    ds = (
        ray.data.read_parquet(
            _events_path(sf_dir), columns=["user_id", "event_type", "ts"]
        )
        .map_batches(_project, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_chains, batch_format="pyarrow")
    )
    # tiny final reduce: Dataset-native sum per depth (n_steps rows total),
    # ONE execution of the pipeline.
    agg_rows = ds.groupby("depth").sum("cnt").take_all()
    by_depth = {int(r["depth"]): int(r["sum(cnt)"]) for r in agg_rows}
    out = pa.table(
        {
            "step_idx": pa.array(
                np.arange(1, len(steps) + 1, dtype=np.int64)
            ),
            "step": pa.array(list(steps), pa.string()),
            "n_users": pa.array(
                [by_depth.get(i, 0) for i in range(1, len(steps) + 1)],
                pa.int64(),
            ),
        }
    )
    return out
