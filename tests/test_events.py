"""Salted sessionization (events.py two-level plan): exact equivalence
with a brute-force per-user scan, including sessions that straddle the
(user, day-bucket) pre-session boundary, and a 10^6-event heavy user
passing under the salted plan (the unsalted groupby(user) would ship all
raw events of that user to one group)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_go_ray.pipelines import events

GAP_S = 1800
GAP_US = GAP_S * 1_000_000


def _brute_sessions(us_by_user: dict[int, np.ndarray]):
    out = []
    for uid, us in sorted(us_by_user.items()):
        us = np.sort(us)
        brk = np.ones(len(us), dtype=bool)
        brk[1:] = us[1:] - us[:-1] > GAP_US
        heads = np.flatnonzero(brk)
        sizes = np.diff(np.append(heads, len(us)))
        for sid, (h, n) in enumerate(zip(heads, sizes)):
            out.append((uid, sid, int(n), int(us[h])))
    return sorted(out)


def _write_events(tmp_path, us_by_user):
    rows_u, rows_t = [], []
    for uid, us in us_by_user.items():
        rows_u.append(np.full(len(us), uid, dtype=np.int64))
        rows_t.append(np.asarray(us, dtype=np.int64))
    u = np.concatenate(rows_u)
    t = np.concatenate(rows_t)
    perm = np.random.default_rng(7).permutation(len(u))  # unordered input
    path = tmp_path / "events.parquet"
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(u), dtype=np.int64)[perm]),
                "user_id": pa.array(u[perm]),
                "ts": pa.array(t[perm], type=pa.timestamp("us")),
                "value": pa.array(np.zeros(len(u))),
            }
        ),
        str(path),
    )
    return str(tmp_path)


def test_sessionize_matches_brute_force_across_day_boundaries(tmp_path):
    day = 86_400_000_000
    rng = np.random.default_rng(3)
    us_by_user = {}
    for uid in range(6):
        # clustered bursts, some deliberately straddling midnight: events
        # at 23:55..00:20 with < gap spacing must form ONE session
        bursts = []
        for d in range(3):
            base = d * day
            bursts.append(base + np.arange(5) * 60_000_000)  # morning burst
            bursts.append(
                base + day - 300_000_000 + np.arange(8) * 90_000_000
            )  # straddles midnight (8 * 90 s from 23:55)
        extra = rng.integers(0, 3 * day, size=20)
        us_by_user[uid] = np.concatenate(bursts + [extra])
    sf = _write_events(tmp_path, us_by_user)
    got = sorted(
        (
            int(r["user_id"]),
            int(r["session_id"]),
            int(r["n_events"]),
            int(r["session_start_us"]),
        )
        for r in events.sessionize(sf, gap_seconds=GAP_S).take_all()
    )
    assert got == _brute_sessions(us_by_user)


def test_sessionize_heavy_user_million_events(tmp_path):
    """One bot user with 10^6 events across ~12 days: the salted plan's
    per-user stitch sees only its local sessions (hundreds), never the
    raw events."""
    rng = np.random.default_rng(11)
    # ~300 sessions of ~3300 events each, 1 event/sec inside a session,
    # 2 h between sessions
    n_sessions, per = 300, 3334
    starts = np.cumsum(
        rng.integers(7200, 7800, size=n_sessions).astype(np.int64)
    ) * 1_000_000
    us = (starts[:, None] + np.arange(per, dtype=np.int64)[None, :] * 1_000_000)
    heavy = us.ravel()[: 10**6]
    us_by_user = {42: heavy, 1: np.array([0, 10**13], dtype=np.int64)}
    sf = _write_events(tmp_path, us_by_user)
    out = events.sessionize(sf, gap_seconds=GAP_S).take_all()
    mine = [r for r in out if r["user_id"] == 42]
    assert sum(r["n_events"] for r in mine) == 10**6
    # session ordinals are dense and starts strictly increase
    mine.sort(key=lambda r: r["session_id"])
    assert [r["session_id"] for r in mine] == list(range(len(mine)))
    assert all(
        a["session_start_us"] < b["session_start_us"]
        for a, b in zip(mine, mine[1:])
    )
    # spot-check the brute session count on the heavy user
    brk = np.ones(len(heavy), dtype=bool)
    hs = np.sort(heavy)
    brk[1:] = hs[1:] - hs[:-1] > GAP_US
    assert len(mine) == int(brk.sum())


def test_funnel_counts_vs_bruteforce(sf_dir):
    """funnel_counts == a per-user sequential greedy-earliest chain with
    the whole chain inside the window of the step-1 anchor."""
    import collections
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from lucene_go_ray.pipelines import events

    steps, within = ("view", "click", "purchase"), 28800
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts"],
    )
    six_map = {s: i for i, s in enumerate(steps)}
    by_user: dict = collections.defaultdict(lambda: collections.defaultdict(list))
    for u, e, ts in zip(
        t["user_id"].to_pylist(),
        t["event_type"].to_pylist(),
        t["ts"].cast("int64").to_pylist(),
    ):
        if e in six_map:
            by_user[u][six_map[e]].append(ts)
    W = within * 1_000_000
    cnt = [0] * len(steps)
    for u, ev in by_user.items():
        cur, anchor = -1, None
        for s in range(len(steps)):
            nxt = [x for x in sorted(ev[s]) if x > cur]
            if not nxt:
                break
            tn = nxt[0]
            if s == 0:
                anchor = tn
            elif tn - anchor > W:
                break
            cur = tn
            cnt[s] += 1
    got = events.funnel_counts(
        sf_dir, steps=steps, within_seconds=within
    )
    assert got["n_users"].to_pylist() == cnt
    assert got["step"].to_pylist() == list(steps)
    assert cnt[0] >= cnt[1] >= cnt[2]  # a funnel narrows
