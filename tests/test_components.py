"""Connected components: distributed min-label propagation must equal
driver DSU; Jaccard verification stage; bucket stats."""

import numpy as np
import pyarrow as pa
import pytest


def _random_edges(n_nodes=300, n_edges=500, seed=11):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})


def test_distributed_components_equal_dsu(ray_session):
    import ray.data as rd

    from raydedup.stages.components import components_distributed, components_driver

    edges = _random_edges()
    want = components_driver(rd.from_arrow(edges))
    got = (
        components_distributed(rd.from_arrow(edges), num_partitions=4)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want_df = want.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert got["image_id"].tolist() == want_df["image_id"].tolist()
    assert got["cluster_id"].tolist() == want_df["cluster_id"].tolist()


def test_verify_pairs_filters_by_jaccard(ray_session):
    import ray.data as rd

    from raydedup.hashing import generate_permutations
    from raydedup.minhash import jaccard_estimate, minhash_batch
    from raydedup.schema import numpy_to_sig
    from raydedup.stages.verify import verify_pairs

    a, b = generate_permutations(128, 1)
    base = [f"t{i}".encode() for i in range(40)]
    docs = [base, base[:35] + [b"x%d" % i for i in range(5)], [b"z%d" % i for i in range(40)]]
    sig = minhash_batch(docs, a, b)
    sig_t = pa.table(
        {"image_id": pa.array(["a", "b", "c"]), "minhash": numpy_to_sig(sig)}
    )
    pairs_t = pa.table({"id_a": pa.array(["a", "a"]), "id_b": pa.array(["b", "c"])})
    out = verify_pairs(
        rd.from_arrow(pairs_t), rd.from_arrow(sig_t), "image_id", threshold=0.5, num_partitions=2
    ).take_all()
    kept = {(r["id_a"], r["id_b"]) for r in out}
    assert ("a", "b") in kept and ("a", "c") not in kept
    (ab,) = [r for r in out if r["id_b"] == "b"]
    assert ab["jaccard"] == pytest.approx(float(jaccard_estimate(sig[0], sig[1])))


def test_bucket_stats(ray_session):
    import ray.data as rd

    from raydedup.stages.bands import bucket_stats

    t = pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(6)]),
            "bucket": pa.array([1, 1, 1, 2, 2, 3], pa.uint64()),
        }
    )
    got = {r["bucket"]: r["size"] for r in bucket_stats(rd.from_arrow(t)).take_all()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_distributed_components_chain(ray_session):
    """Worst-case diameter: a 300-node path converges via pointer
    jumping (would exceed any fixed round cap with plain neighbor-min)."""
    import ray.data as rd

    from raydedup.stages.components import components_distributed

    edges = pa.table({"id_a": pa.array(range(299)), "id_b": pa.array(range(1, 300))})
    got = components_distributed(rd.from_arrow(edges), num_partitions=4).to_pandas()
    assert len(got) == 300
    assert (got["cluster_id"] == 0).all()


def test_driver_components_chain_scales_logarithmically(ray_session):
    """Driver kernel on a 100k-node path with scrambled codes: plain
    neighbor-min propagation needs ~n/4 rounds here (145 s measured);
    hook-to-min + full compression converges in O(log n). Equality vs
    the per-edge Python DSU is asserted on a prefix; the full run just
    has to finish fast."""
    import time

    import ray.data as rd

    from raydedup.stages.components import DSU, components_driver

    n = 100_000
    rng = np.random.default_rng(3)
    name = rng.permutation(n)  # scrambled ids → worst-case label order
    edges = pa.table(
        {
            "id_a": pa.array([f"img{name[i]:06d}" for i in range(n - 1)]),
            "id_b": pa.array([f"img{name[i]:06d}" for i in range(1, n)]),
        }
    )
    # prefix equality vs DSU
    k = 2000
    sl = edges.slice(0, k)
    dsu = DSU()
    for x, y in zip(sl.column("id_a").to_pylist(), sl.column("id_b").to_pylist()):
        dsu.union(x, y)
    got = components_driver(rd.from_arrow(sl))
    gd = dict(zip(got.column("image_id").to_pylist(), got.column("cluster_id").to_pylist()))
    assert gd == dsu.labels()
    # full path: one component, wall bounded (pre-fix: minutes)
    t0 = time.perf_counter()
    full = components_driver(rd.from_arrow(edges))
    assert time.perf_counter() - t0 < 20.0
    assert full.num_rows == n
    assert len(set(full.column("cluster_id").to_pylist())) == 1


def test_bucket_cap_star_is_component_equivalent(ray_session):
    """Buckets above bucket_cap emit a star instead of O(m²) pairs —
    same connected components, far fewer edges."""
    import ray.data as rd

    from raydedup.stages.bands import candidate_pairs
    from raydedup.stages.components import components_driver

    m = 60
    band = pa.table(
        {
            "image_id": pa.array([f"x{i:03d}" for i in range(m)] + ["y0", "y1"]),
            "bucket": pa.array([7] * m + [9, 9], pa.uint64()),
        }
    )
    full = candidate_pairs(rd.from_arrow(band), "image_id", bucket_cap=512, num_partitions=2)
    star = candidate_pairs(rd.from_arrow(band), "image_id", bucket_cap=8, num_partitions=2)
    n_full, n_star = full.count(), star.count()
    assert n_full == m * (m - 1) // 2 + 1
    assert n_star == (m - 1) + 1  # star + the small bucket pair
    lab_full = components_driver(full).to_pandas()
    lab_star = components_driver(star).to_pandas()
    assert lab_full.equals(lab_star)


def test_distributed_jump_deep_forest(ray_session):
    """Regression: many ascending 4-node paths peel into depth-3 parent
    chains that reach the jump phase. The old jump loop retired records
    whose parent lacked a self row, so a record rewritten onto a parent
    that finalized one round earlier was mislabeled with the stale
    parent (tail of every chain got its grandparent, not the root).
    ``driver_finish_rows=0`` forces the fully distributed endgame."""
    import ray.data as rd

    from raydedup.stages.components import components_distributed, components_driver

    a, b = [], []
    for k in range(50):  # paths n0<n1<n2<n3
        ids = [f"n{k:03d}{j}" for j in range(4)]
        a += ids[:-1]
        b += ids[1:]
    edges = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    want = components_driver(rd.from_arrow(edges)).to_pandas()
    got = (
        components_distributed(rd.from_arrow(edges), num_partitions=4, driver_finish_rows=0)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got.equals(want.sort_values("image_id").reset_index(drop=True))


def test_distributed_components_random_stress(ray_session):
    """Randomized parity vs the Python DSU across the shapes that broke
    earlier designs: mixed stars + chains + random blobs + duplicate
    edges + reversed orientations, on both endgames (driver finish and
    fully distributed jump)."""
    import ray.data as rd

    from raydedup.stages.components import DSU, components_distributed

    rng = np.random.default_rng(17)
    a_parts, b_parts = [], []
    nid = 0

    def take(k):
        nonlocal nid
        out = np.arange(nid, nid + k)
        nid += k
        return out

    for _ in range(8):  # stars
        s = take(int(rng.integers(2, 30)))
        a_parts += [np.full(len(s) - 1, s[0])]
        b_parts += [s[1:]]
    for _ in range(4):  # chains (scrambled ids)
        c = rng.permutation(take(int(rng.integers(5, 40))))
        a_parts += [c[:-1]]
        b_parts += [c[1:]]
    blob = take(60)  # random blob
    a_parts += [rng.choice(blob, 80)]
    b_parts += [rng.choice(blob, 80)]
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    keep = a != b
    a, b = a[keep], b[keep]
    dup = rng.integers(0, len(a), len(a) // 2)  # duplicates, half reversed
    a, b = np.concatenate([a, b[dup]]), np.concatenate([b, a[dup]])
    ids_a = [f"s{x:05d}" for x in a]
    ids_b = [f"s{x:05d}" for x in b]
    edges = pa.table({"id_a": pa.array(ids_a), "id_b": pa.array(ids_b)})

    dsu = DSU()
    for x, y in zip(ids_a, ids_b):
        dsu.union(x, y)
    want = dict(sorted(dsu.labels().items()))

    for finish_rows in (4_000_000, 0):
        got_tbl = (
            components_distributed(
                rd.from_arrow(edges), num_partitions=4, driver_finish_rows=finish_rows
            )
            .to_pandas()
            .sort_values("image_id")
        )
        got = dict(zip(got_tbl["image_id"], got_tbl["cluster_id"]))
        assert got == want, f"finish_rows={finish_rows}"


def test_distributed_components_string_ids(ray_session):
    """The flagship id column is a STRING — the distributed path (and
    its fixpoint test) must work on non-numeric ids."""
    import ray.data as rd

    from raydedup.stages.components import components_distributed, components_driver

    edges = pa.table(
        {
            "id_a": pa.array([f"img-{i:04d}" for i in range(0, 60, 2)]),
            "id_b": pa.array([f"img-{i:04d}" for i in range(1, 61, 2)]),
        }
    )
    want = components_driver(rd.from_arrow(edges)).to_pandas().sort_values("image_id").reset_index(drop=True)
    got = (
        components_distributed(rd.from_arrow(edges), num_partitions=4)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got["image_id"].tolist() == want["image_id"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
