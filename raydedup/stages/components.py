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
    """Min-label propagation + pointer jumping entirely on the engine's
    keyed-shuffle primitive (``map_key_runs``) — NO ``Dataset.join``
    (chained joins are fragile on this Ray version; the keyed shuffle
    is the one exchange the engine already trusts at scale). Returns a
    Dataset (image_id, cluster_id).

    Per round: (1) *gather* — every node's label is delivered to its
    neighbors via a shuffle keyed on the edge target; (2) *min* — each
    node takes the min of its own and received labels; (3) *jump* —
    label[x] ← label[label[x]] (shortcutting), so a path graph
    converges in O(log n) rounds instead of O(diameter). The fixpoint
    test counts per-node label mismatches old-vs-new with the same
    keyed-run primitive (works for string and numeric ids alike)."""
    import numpy as np

    from raydedup.stages.grouped import map_key_runs, staged, tune_for_session

    tune_for_session(pairs_ds)

    def both_dirs(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a").combine_chunks(), t.column("id_b").combine_chunks()
        if isinstance(a, pa.ChunkedArray):
            a = a.chunk(0) if a.num_chunks else pa.array([], t.schema.field("id_a").type)
        if isinstance(b, pa.ChunkedArray):
            b = b.chunk(0) if b.num_chunks else pa.array([], t.schema.field("id_b").type)
        return pa.table({"node": pa.concat_arrays([a, b]), "nbr": pa.concat_arrays([b, a])})

    edges = staged(pairs_ds.map_batches(both_dirs, batch_format="pyarrow"))
    id_type = edges.schema().base_schema.field("node").type

    # init: label[x] = min(x, neighbors(x)) — one keyed run pass
    def init_labels(block: pa.Table, starts, ends) -> pa.Table:
        nodes = block.column("node").to_pylist()
        nbrs = block.column("nbr").to_pylist()
        o_n, o_l = [], []
        for s, e in zip(starts, ends):
            k = nodes[s]
            o_n.append(k)
            o_l.append(min(k, min(nbrs[s:e])))
        return pa.table({"node": pa.array(o_n, id_type), "label": pa.array(o_l, id_type)})

    labels = staged(map_key_runs(edges, "node", init_labels, num_partitions, min_run=1))

    def tag_labels(key_col: str, payload_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": batch.column(key_col),
                    "payload": batch.column(payload_col),
                    "tag": pa.array(np.ones(len(batch), dtype=np.int8)),
                }
            )

        return fn

    def tag_edges(batch: pa.Table) -> pa.Table:
        # deliver TO nbr's run; payload = the receiving node
        return pa.table(
            {
                "key": batch.column("nbr"),
                "payload": batch.column("node"),
                "tag": pa.array(np.zeros(len(batch), dtype=np.int8)),
            }
        )

    def gather(block: pa.Table, starts, ends) -> pa.Table:
        tags = block.column("tag").to_numpy(zero_copy_only=False)
        payload = block.column("payload").to_pylist()
        keys = block.column("key").to_pylist()
        o_n, o_l = [], []
        for s, e in zip(starts, ends):
            lab = None
            for i in range(s, e):
                if tags[i] == 1:
                    lab = payload[i]
                    break
            if lab is None:
                continue
            o_n.append(keys[s])  # node keeps its own label
            o_l.append(lab)
            for i in range(s, e):
                if tags[i] == 0:
                    o_n.append(payload[i])
                    o_l.append(lab)
        return pa.table({"node": pa.array(o_n, id_type), "label": pa.array(o_l, id_type)})

    def min_label(block: pa.Table, starts, ends) -> pa.Table:
        nodes = block.column("node").to_pylist()
        labs = block.column("label").to_pylist()
        o_n, o_l = [], []
        for s, e in zip(starts, ends):
            o_n.append(nodes[s])
            o_l.append(min(labs[s:e]))
        return pa.table({"node": pa.array(o_n, id_type), "label": pa.array(o_l, id_type)})

    def jump(block: pa.Table, starts, ends) -> pa.Table:
        tags = block.column("tag").to_numpy(zero_copy_only=False)
        payload = block.column("payload").to_pylist()
        o_n, o_l = [], []
        for s, e in zip(starts, ends):
            lab = None
            for i in range(s, e):
                if tags[i] == 1:
                    lab = payload[i]
                    break
            if lab is None:
                continue
            for i in range(s, e):
                if tags[i] == 0:
                    o_n.append(payload[i])
                    o_l.append(lab)
        return pa.table({"node": pa.array(o_n, id_type), "label": pa.array(o_l, id_type)})

    def count_changes(old_ds, new_ds) -> int:
        tagged = old_ds.map_batches(tag_labels("node", "label"), batch_format="pyarrow").union(
            new_ds.map_batches(
                lambda t: pa.table(
                    {
                        "key": t.column("node"),
                        "payload": t.column("label"),
                        "tag": pa.array(np.full(len(t), 2, dtype=np.int8)),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def cmp(block: pa.Table, starts, ends) -> pa.Table:
            tags = block.column("tag").to_numpy(zero_copy_only=False)
            payload = block.column("payload").to_pylist()
            n_changed = 0
            for s, e in zip(starts, ends):
                old = new = None
                for i in range(s, e):
                    if tags[i] == 1:
                        old = payload[i]
                    else:
                        new = payload[i]
                if old != new:
                    n_changed += 1
            return pa.table({"c": pa.array([n_changed], pa.int64())})

        out = map_key_runs(tagged, "key", cmp, num_partitions, min_run=1).sum("c")
        return int(out or 0)

    for _ in range(max_rounds):
        msgs = edges.map_batches(tag_edges, batch_format="pyarrow").union(
            labels.map_batches(tag_labels("node", "label"), batch_format="pyarrow")
        )
        received = staged(map_key_runs(msgs, "key", gather, num_partitions))
        new_labels = staged(map_key_runs(received, "node", min_label, num_partitions, min_run=1))
        # pointer jumping: deliver label[k] to every node labeled k
        jmp_in = new_labels.map_batches(
            lambda t: pa.table(
                {
                    "key": t.column("label"),
                    "payload": t.column("node"),
                    "tag": pa.array(np.zeros(len(t), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        ).union(new_labels.map_batches(tag_labels("node", "label"), batch_format="pyarrow"))
        new_labels = staged(map_key_runs(jmp_in, "key", jump, num_partitions, min_run=1))
        changed = count_changes(labels, new_labels)
        labels = new_labels
        if changed == 0:
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
