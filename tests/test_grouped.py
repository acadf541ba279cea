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


def test_map_key_runs_more_partitions_than_keys(ray_session):
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


def test_map_key_runs_unsorted_input_runs_are_whole_groups(ray_session):
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


def test_exact_dedup_sparse_keys_many_partitions(ray_session):
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


def test_substring_pairs_slim_path(ray_session):
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
