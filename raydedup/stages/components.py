"""Connected components over the candidate-pair edge list.

The reference stops at candidate sets (``MinHashLSH.query``); clustering
is user-land (SURVEY.md §2.5). Here:

- **driver DSU** (union-find with path halving) when the edge list is
  small enough to collect — candidate edges are tiny relative to the
  corpus (each near-dup cluster contributes O(cluster²) edges), so this
  covers test and most production scales;
- **distributed min-label propagation** otherwise: labels start as the
  node id; each round every node takes the min label over itself and
  its neighbors (both edge directions) via join + groupby(min); stops
  at fixpoint. Rounds ≈ graph diameter — dup clusters are near-cliques,
  so a handful of rounds. Cf. BTS (ICDE'24) in PAPERS.md for the
  balanced-tree refinement this would adopt at extreme skew.

Cluster id = min member id (deterministic, order-insensitive).
"""

from __future__ import annotations

import pyarrow as pa


class DSU:
    """Union-find with path halving + union by attaching larger root to
    smaller (so the root is always the MIN id — deterministic labels)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def labels(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def components_driver(pairs_ds) -> pa.Table:
    """Collect the (small) edge list and run DSU. Returns an Arrow table
    (image_id, cluster_id) covering every node that appears in an edge.
    Tolerates duplicate edges (band multiplicity): each batch is
    deduped with one Arrow kernel before the Python union loop."""
    import pyarrow.compute as pc

    dsu = DSU()
    for batch in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if len(batch) == 0:
            continue
        batch = batch.select(["id_a", "id_b"]).group_by(["id_a", "id_b"]).aggregate([])
        for a, b in zip(batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()):
            dsu.union(a, b)
    lab = dsu.labels()
    ids = sorted(lab)
    return pa.table(
        {
            "image_id": pa.array(ids),
            "cluster_id": pa.array([lab[i] for i in ids]),
        }
    )


def components_distributed(pairs_ds, num_partitions: int = 32, max_rounds: int = 50):
    """Min-label propagation entirely in Ray Data; returns a Dataset
    (image_id, cluster_id). Each round is one join + one groupby-min."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min

    from raydedup.stages.grouped import tune_for_session

    tune_for_session(pairs_ds)

    # undirected edges, both directions
    fwd = pairs_ds.map_batches(
        lambda t: pa.table({"src": t.column("id_a"), "dst": t.column("id_b")}),
        batch_format="pyarrow",
    )
    rev = pairs_ds.map_batches(
        lambda t: pa.table({"src": t.column("id_b"), "dst": t.column("id_a")}),
        batch_format="pyarrow",
    )
    edges = fwd.union(rev).materialize()  # reused every round; edge list ≪ corpus

    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("src"),
                    "label": pc.min_element_wise(t.column("src"), t.column("nbr_min")),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_rounds):
        # neighbor labels: edges ⋈ labels on dst → (src, neighbor label)
        msgs = edges.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("dst",), right_on=("node",)
        ).map_batches(
            lambda t: pa.table({"node": t.column("src"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # pointer jumping (shortcutting): label[x] ← label[label[x]].
        # Neighbor-min alone needs O(diameter) rounds — a path graph
        # would exceed any fixed round cap; with shortcutting the
        # combination converges in O(log n) rounds.
        hop = new_labels.join(
            new_labels,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("node",),
            left_suffix="_l",
            right_suffix="_r",
        )
        new_labels = hop.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node" if "node" in t.column_names else "node_l"),
                    "label": pc.min_element_wise(
                        t.column("label_l" if "label_l" in t.column_names else "label"),
                        t.column("label_r"),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        # converged when no label changed: compare via anti-join-free check
        joined = new_labels.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("node",),
            right_on=("node",),
            right_suffix="_old",
        )
        changed = joined.map_batches(
            lambda t: pa.table(
                {"c": [int(pc.sum(pc.cast(pc.not_equal(t.column("label"), t.column("label_old")), pa.int64())).as_py() or 0)]}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"image_id": t.column("node"), "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )


def connected_components(pairs_ds, max_driver_edges: int = 5_000_000, num_partitions: int = 32):
    """Auto-select: driver DSU below ``max_driver_edges``, else
    distributed label propagation. Returns an Arrow table or Dataset of
    (image_id, cluster_id).

    The input may be a raw edge MULTISET (band/mode duplicates — the
    pipeline skips the dedupe shuffle for exactly this consumer); if the
    raw count is over the driver budget, one dedupe shuffle usually
    collapses it back under (band multiplicity is ~b×), so the fast
    driver path is re-tested on the distinct edge set before falling
    back to distributed label propagation."""
    from raydedup.stages.grouped import auto_partitions, staged, unique_rows_partitioned

    n = pairs_ds.count()
    if n <= max_driver_edges:
        return components_driver(pairs_ds)
    uniq = staged(
        unique_rows_partitioned(pairs_ds, ["id_a", "id_b"], auto_partitions(n))
    )
    if uniq.count() <= max_driver_edges:
        return components_driver(uniq)
    return components_distributed(uniq, num_partitions=num_partitions)
