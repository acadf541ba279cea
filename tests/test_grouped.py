"""Regression tests for the keyed-shuffle primitive (stages/grouped.py).

Ray 2.49 skips map UDFs on empty blocks AND skips the hash-shuffle
schema broadcast when the first shuffled block is empty, so a
``repartition(keys=..., sort=True)`` chain crashes with ArrowInvalid
('No match for FieldRef.Name(...)') whenever partitions ≫ distinct keys
(CORRECTNESS_r01: substring_pairs_docs at num_cpus=32). The engine now
never sorts in shuffle finalize; these tests chain keyed shuffles with
far more partitions than keys and verify results stay correct.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds_from_table(t: pa.Table, blocks: int):
    import ray.data as rd

    from raydedup.stages.grouped import ensure_hash_shuffle

    ensure_hash_shuffle()
    return rd.from_arrow(t).repartition(blocks)


@pytest.fixture(params=["distributed", "coalesced"])
def shuffle_mode(request, monkeypatch):
    """Run keyed-shuffle tests on BOTH paths: the in-memory test tables
    are metadata-countable, so without forcing SMALL_SHUFFLE_ROWS=0 the
    small-input coalesce would silently take over and the distributed
    empty-partition regressions would go unexercised."""
    import raydedup.stages.grouped as G

    if request.param == "distributed":
        monkeypatch.setattr(G, "SMALL_SHUFFLE_ROWS", 0)
    return request.param


def test_map_key_runs_more_partitions_than_keys(ray_session, shuffle_mode):
    from raydedup.stages.grouped import map_key_runs, unique_rows_partitioned

    # ONE distinct key, 64 requested partitions → nearly every hash
    # partition is empty; the run output feeds a second keyed shuffle.
    t = pa.table(
        {
            "k": pa.array([7] * 50, pa.uint64()),
            "doc": pa.array(np.arange(50), pa.int64()),
        }
    )
    ds = _ds_from_table(t, 8)

    def emit(block: pa.Table, starts, ends) -> pa.Table:
        out_a, out_b = [], []
        docs = block.column("doc").to_numpy(zero_copy_only=False)
        for s, e in zip(starts, ends):
            run = np.sort(docs[s:e])
            out_a.extend([int(run[0])] * (len(run) - 1))
            out_b.extend(run[1:].tolist())
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())}
        )

    pairs = map_key_runs(ds, "k", emit, 64)
    # chained second keyed shuffle on the *emitted* columns — the r01 crash site
    uniq = unique_rows_partitioned(pairs, ["id_a", "id_b"], 64)
    rows = uniq.take_all()
    assert len(rows) == 49
    assert {r["id_a"] for r in rows} == {0}
    assert {r["id_b"] for r in rows} == set(range(1, 50))


def test_map_key_runs_unsorted_input_runs_are_whole_groups(ray_session, shuffle_mode):
    """Groups arrive unsorted within a partition (no finalize sort);
    per-block sort must still present each key as one contiguous run."""
    from raydedup.stages.grouped import map_key_runs

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 20, size=400).astype(np.uint64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(np.arange(400), pa.int64())})
    ds = _ds_from_table(t, 4)

    def emit(block: pa.Table, starts, ends) -> pa.Table:
        ks = block.column("k").to_numpy(zero_copy_only=False)
        sizes = [int(e - s) for s, e in zip(starts, ends)]
        run_keys = [int(ks[s]) for s in starts]
        # within a block, each key appears in at most one run
        assert len(run_keys) == len(set(run_keys))
        return pa.table(
            {
                "k": pa.array(run_keys, pa.uint64()),
                "n": pa.array(sizes, pa.int64()),
            }
        )

    out = map_key_runs(ds, "k", emit, 16).take_all()
    got = {r["k"]: r["n"] for r in out}
    expected = {int(k): int(n) for k, n in zip(*np.unique(keys, return_counts=True)) if n >= 2}
    assert got == expected


def test_exact_dedup_sparse_keys_many_partitions(ray_session, shuffle_mode):
    from raydedup.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(40), pa.int64()),
            "text": pa.array(["same text"] * 20 + [f"uniq {i}" for i in range(20)]),
        }
    )
    ds = _ds_from_table(t, 8)
    kept = exact_dedup(ds, ["text"], "doc_id", num_partitions=64).take_all()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [0] + list(range(20, 40))


def test_substring_pairs_slim_path(ray_session, shuffle_mode):
    """The two-phase substring path: min-window anchors, hash verify,
    duplicate-class expansion — against a brute-force token-slice oracle."""
    import itertools

    from raydedup.stages.dedup import substring_pairs

    docs = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "prefix words alpha beta gamma delta epsilon zeta suffix tail",
        2: "alpha beta gamma delta",          # contained in 0 and 1
        3: "alpha beta gamma delta",          # exact dup of 2 (class expansion)
        4: "unrelated text about something else entirely here",
        5: "x y",                             # short-doc broadcast path
        6: "wrap x y wrap2 more tokens here",  # contains 5
        7: "beta gamma delta epsilon",        # interior slice of 0 and 1
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    ds = _ds_from_table(t, 3)
    got = {
        (r["id_a"], r["id_b"])
        for r in substring_pairs(ds, "doc_id", "text", window=4, num_partitions=16).take_all()
    }
    want = set()
    for a, b in itertools.permutations(docs, 2):
        ta, tb = docs[a], docs[b]
        if len(ta) < len(tb) and f" {ta} " in f" {tb} ":
            want.add((a, b))
    assert got == want


def test_merge_key_groups_matches_groupby(ray_session):
    """The coalesced tail merge must equal a per-group map_groups."""
    from raydedup.stages.grouped import merge_key_groups

    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "q": pa.array(rng.integers(0, 7, size=300), pa.int64()),
            "v": pa.array(rng.random(300), pa.float64()),
            "id": pa.array(np.arange(300), pa.int64()),
        }
    )

    def top3(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v))[:3]
        return group.take(pa.array(order))

    got = {
        (r["q"], r["id"])
        for r in merge_key_groups(_ds_from_table(t, 5), "q", top3).take_all()
    }
    want = {
        (r["q"], r["id"])
        for r in _ds_from_table(t, 5)
        .groupby("q")
        .map_groups(top3, batch_format="pyarrow")
        .take_all()
    }
    assert got == want and len(got) == 7 * 3


def test_sum_by_keys_matches_pandas(ray_session, shuffle_mode):
    from raydedup.queries import _sum_by_keys

    rng = np.random.default_rng(9)
    t = pa.table(
        {
            "a": pa.array(rng.integers(0, 11, size=500), pa.int64()),
            "b": pa.array(rng.integers(0, 3, size=500), pa.int64()),
            "n_part": pa.array(rng.integers(1, 100, size=500), pa.int64()),
        }
    )
    out = _sum_by_keys(_ds_from_table(t, 4), ["a", "b"], "n_part", "n").take_all()
    got = {(r["a"], r["b"]): r["n"] for r in out}
    want = t.to_pandas().groupby(["a", "b"])["n_part"].sum().to_dict()
    assert got == want


def test_map_key_runs_approx_rows_hint(ray_session):
    """A union the planner can't size takes the coalesced path when the
    caller supplies a sound row bound — and the result matches the
    distributed path exactly."""
    import raydedup.stages.grouped as G
    from raydedup.stages.grouped import map_key_runs, meta_count

    t = pa.table(
        {
            "k": pa.array(np.repeat(np.arange(10), 10), pa.int64()),
            "v": pa.array(np.arange(100), pa.int64()),
        }
    )
    # a union of two datasets loses the metadata count
    ds = _ds_from_table(t, 3).union(_ds_from_table(t, 2))
    assert meta_count(ds) is None

    def span(block: pa.Table, starts, ends) -> pa.Table:
        ks = block.column("k").to_numpy(zero_copy_only=False)
        vs = block.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([int(ks[s]) for s in starts], pa.int64()),
                "lo": pa.array([int(vs[s:e].min()) for s, e in zip(starts, ends)], pa.int64()),
                "n": pa.array([int(e - s) for s, e in zip(starts, ends)], pa.int64()),
            }
        )

    hinted = {
        (r["k"], r["lo"], r["n"])
        for r in map_key_runs(ds, "k", span, 16, approx_rows=200).take_all()
    }
    forced = G.SMALL_SHUFFLE_ROWS
    try:
        G.SMALL_SHUFFLE_ROWS = 0
        dist = {
            (r["k"], r["lo"], r["n"])
            for r in map_key_runs(ds, "k", span, 16, approx_rows=200).take_all()
        }
    finally:
        G.SMALL_SHUFFLE_ROWS = forced
    assert hinted == dist
    assert {k for k, _, _ in hinted} == set(range(10))
    assert all(n == 20 for _, _, n in hinted)


def test_orders_by_segment_shuffle_fallback(ray_session):
    """VERDICT r04 wrong-#2: the dimension-table broadcast in
    q_orders_by_segment is size-gated; a lowered gate must route through
    the reduce-side custkey join and produce the identical table."""
    from raydedup.queries import q_orders_by_segment

    sf = "/root/testdata/sf0.001"
    broadcast = (
        q_orders_by_segment(sf).to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    )
    joined = (
        q_orders_by_segment(sf, broadcast_max_rows=0)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert broadcast.equals(joined)


def test_sessionize_events_gap_semantics(ray_session, tmp_path):
    """Gap-based sessionization: a gap of EXACTLY gap_us stays in the
    same session, one microsecond more starts a new one; per-user
    ordinals are 1-based; singleton users sessionize too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.queries import q_sessionize_events

    gap = 1_800_000_000
    base = 1_700_000_000_000_000
    rows = {
        "user_id": [1, 1, 1, 1, 2],
        "ts": pa.array(
            [base, base + gap, base + 2 * gap + 1, base + 2 * gap + 2, base],
            pa.timestamp("us"),
        ),
    }
    pq.write_table(pa.table(rows), tmp_path / "events.parquet")
    out = q_sessionize_events(str(tmp_path)).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    # user 1: events 1+2 share session 1 (gap == gap_us keeps), events
    # 3+4 are session 2 (gap_us+1 breaks); user 2 is a singleton
    assert out.to_dict("records") == [
        {"user_id": 1, "session_id": 1, "n_events": 2, "start_us": base, "end_us": base + gap},
        {"user_id": 1, "session_id": 2, "n_events": 2, "start_us": base + 2 * gap + 1, "end_us": base + 2 * gap + 2},
        {"user_id": 2, "session_id": 1, "n_events": 1, "start_us": base, "end_us": base},
    ]


def test_json_field_stats_extraction(ray_session, tmp_path):
    """The vectorized regex extraction matches per-row parsing,
    including rows without the field (count them, skip their sum)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.queries import q_json_field_stats

    rows = {
        "event_type": ["a", "a", "b", "b"],
        "props": ['{"k": 3}', '{"k": -2}', '{"k": 10}', "{}"],
    }
    pq.write_table(pa.table(rows), tmp_path / "events.parquet")
    out = q_json_field_stats(str(tmp_path)).to_pandas().sort_values("event_type")
    assert out.to_dict("records") == [
        {"event_type": "a", "n_events": 2, "sum_k": 1, "max_k": 3},
        {"event_type": "b", "n_events": 2, "sum_k": 10, "max_k": 10},
    ]


def test_asof_join_events_semantics(ray_session, tmp_path):
    """As-of join tie rules pinned on a hand-built stream: equal-ts
    views ARE eligible for a click at the same ts (views sort before
    clicks), ties among views resolve to the largest event_id, clicks
    with no prior view get -1 sentinels, and user streams never bleed
    into each other."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.queries import q_asof_join_events

    t0 = dt.datetime(2024, 1, 1)
    us = lambda n: t0 + dt.timedelta(microseconds=n)
    rows = [
        # user 1: click before any view → -1; then view/click pairs
        (0, us(10), 1, "click"),
        (1, us(20), 1, "view"),
        (2, us(30), 1, "click"),      # → view 1, gap 10
        (3, us(40), 1, "view"),
        (4, us(40), 1, "view"),       # equal-ts views: largest id wins
        (5, us(40), 1, "click"),      # → view 4 (same ts eligible), gap 0
        (6, us(50), 1, "error"),      # other types ignored
        # user 2: isolated — must not see user 1's views
        (7, us(25), 2, "click"),      # → -1
        (8, us(60), 2, "view"),
        (9, us(70), 2, "click"),      # → view 8, gap 10
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = (
        q_asof_join_events(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = {
        0: (-1, -1),
        2: (1, 10),
        5: (4, 0),
        7: (-1, -1),
        9: (8, 10),
    }
    assert got["event_id"].tolist() == sorted(want)
    for row in got.itertuples(index=False):
        assert (row.matched_event_id, row.gap_us) == want[row.event_id], row.event_id


def test_asof_join_events_bruteforce(ray_session):
    """Full sf0.001 events table vs a pure Python per-user scan."""
    import pyarrow.parquet as pq

    from raydedup.queries import q_asof_join_events

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    evs = sorted(
        (r for r in t.to_pylist() if r["event_type"] in ("view", "click")),
        key=lambda r: (r["user_id"], r["ts"], r["event_type"] == "click", r["event_id"]),
    )
    want = {}
    last_view = {}
    for r in evs:
        u = r["user_id"]
        if r["event_type"] == "view":
            last_view[u] = r
        else:
            v = last_view.get(u)
            if v is None:
                want[r["event_id"]] = (-1, -1)
            else:
                d = r["ts"] - v["ts"]
                gap = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
                want[r["event_id"]] = (v["event_id"], gap)
    got = q_asof_join_events(sf).to_pandas()
    assert len(got) == len(want) > 0
    for row in got.itertuples(index=False):
        assert (row.matched_event_id, row.gap_us) == want[row.event_id], row.event_id


def test_overlapping_sessions_boundary_and_dedupe(ray_session, tmp_path):
    """Interval-join edge rules pinned on hand-built sessions around a
    bucket boundary (W = 1 h): a session straddling two buckets pairs
    exactly once with partners in EITHER bucket (canonical-bucket
    dedupe), point-touching intervals (end_a == start_b) count with
    overlap 0 (closed intervals), and equal-start ties canonicalize by
    (user, session)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.queries import q_overlapping_sessions

    t0 = dt.datetime(2024, 1, 1)  # epoch hour-aligned: bucket edge at +60 min
    m = lambda n: t0 + dt.timedelta(minutes=n)
    rows = [
        # user 1: ONE session [50, 70] min (20-min event gap < 30-min
        # cutoff) — straddles the 60-min bucket boundary, replicates to
        # buckets 0 and 1
        (1, m(50)), (1, m(70)),
        # user 2: [65, 66] — bucket 1 only; overlaps user 1 there
        (2, m(65)), (2, m(66)),
        # user 3: [55, 58] — bucket 0 only; overlaps user 1 there
        (3, m(55)), (3, m(58)),
        # user 4: point session [70, 70] touching user 1's end exactly
        (4, m(70)),
        # user 5: [50, 52] — start TIES user 1's; user id breaks the tie
        (5, m(50)), (5, m(52)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["view"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_overlapping_sessions(str(tmp_path)).to_pandas()
    MIN = 60_000_000
    want = {
        (1, 1, 2, 1, 1 * MIN),   # min(70,66)-65
        (1, 1, 3, 1, 3 * MIN),   # min(70,58)-55
        (1, 1, 4, 1, 0),         # point touch
        (1, 1, 5, 1, 2 * MIN),   # tie at 50: user 1 is the 'a' side
    }
    assert set(map(tuple, got.itertuples(index=False))) == want
    assert len(got) == len(want)  # no double-emission across buckets


def test_overlapping_sessions_bruteforce(ray_session):
    """Full sf0.001 pipeline vs a brute-force O(n²) sweep over the
    sessionize output — pins the replicate/sweep machinery independent
    of the SQL oracle."""
    from raydedup.queries import q_overlapping_sessions, q_sessionize_events

    sf = "/root/testdata/sf0.001"
    sess = q_sessionize_events(sf).to_pandas()
    recs = sorted(
        sess.itertuples(index=False),
        key=lambda r: (r.start_us, r.user_id, r.session_id),
    )
    want = set()
    for i, b in enumerate(recs):
        for a in recs[:i]:
            if a.end_us >= b.start_us and a.user_id != b.user_id:
                want.add(
                    (a.user_id, a.session_id, b.user_id, b.session_id,
                     min(a.end_us, b.end_us) - b.start_us)
                )
    got = q_overlapping_sessions(sf).to_pandas()
    assert set(map(tuple, got.itertuples(index=False))) == want
    assert len(got) == len(want) > 0
