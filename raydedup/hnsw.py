"""HNSW approximate-nearest-neighbor index (Malkov & Yashunin, TPAMI
2018 — implemented from the paper's Alg. 1-5, not ported from the
reference ``datasketch/hnsw.py``; same role as reference ``HNSW`` but a
different, numpy-centric structure).

Single-shard index used by the distributed path in ``stages/ann.py``:
one ``HnswIndex`` per shard actor, queries fan out and merge. Distance
computations are counted (``n_dist``) so recall/efficiency versus brute
force is measurable (the reference's own test strategy,
``test/test_hnsw.py``).

Metrics: cosine (default — vectors L2-normalized at ingest, distance
= 1 − dot), ``l2``, ``dot`` (inner-product as −dot), or an arbitrary
batched ``distance_func(q, M) -> dists`` (the reference takes a
per-pair ``distance_func``; its own tests exercise l2 and jaccard).
"""

from __future__ import annotations

import math

import numpy as np


class HnswIndex:
    """Mutable single-shard index. Beyond build/search it carries the
    reference's maintenance surface (``datasketch/hnsw.py:451-603`` for
    insert-as-update, ``703-973`` for soft/hard delete, clean and
    merge), re-derived for this numpy structure:

    - *soft remove* hides a point from query results but keeps it for
      graph traversal (hnswlib issue #4 semantics, same as reference);
    - *hard remove* additionally repairs the in-edges of every node
      pointing at it (search-based re-selection, reference
      ``_repair_connections``) and detaches the node; the vector slot
      is reclaimed lazily by the next ``build()`` compaction;
    - *upsert*: adding an existing id updates its vector and repairs
      its out-edges — cheap here because edges store no cached
      distances, so neighbors' edge lists stay valid as-is;
    - ``len``/``in`` reflect live, non-deleted points only.
    """

    def __init__(
        self,
        m: int = 16,
        ef_construction: int = 100,
        seed: int = 1,
        metric: str = "cosine",
        distance_func=None,
    ):
        self.m = m
        self.m0 = 2 * m
        self.ml = 1.0 / math.log(m)
        self.ef_construction = ef_construction
        self.rng = np.random.default_rng(seed)
        # Distance pluggability (reference HNSW takes an arbitrary
        # ``distance_func``, ``hnsw.py:200-210``; its tests use l2 and
        # jaccard). Built-ins are vectorized; a custom callable must be
        # batched: f(q: (d,), M: (n, d)) -> (n,) distances. Vectors are
        # L2-normalized at ingest only under cosine.
        if distance_func is not None:
            metric = "custom"
        elif metric not in ("cosine", "l2", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.distance_func = distance_func
        self.vectors: np.ndarray | None = None  # (n, d), normalized
        self._rows: list[np.ndarray] = []
        self._row_ids: list = []
        self.ids: list = []  # idx -> id (None once hard-removed)
        self.id_to_idx: dict = {}
        self.deleted: set[int] = set()  # soft-removed node indices
        self.dead: set[int] = set()  # hard-removed slots, reclaimed by build()
        # neighbors[layer][node] -> list[int]; layer 0 exists for all
        self.neighbors: list[dict[int, list[int]]] = [{}]
        self.node_level: list[int] = []
        self.entry: int | None = None
        self.n_dist = 0

    def __len__(self) -> int:
        self.build()
        return len(self.id_to_idx) - len(self.deleted)

    def __contains__(self, key) -> bool:
        self.build()
        i = self.id_to_idx.get(key)
        return i is not None and i not in self.deleted

    # ---------------------------------------------------------- internals
    def _dist(self, q: np.ndarray, nodes: list[int]) -> np.ndarray:
        self.n_dist += len(nodes)
        v = self.vectors[nodes]
        if self.metric == "cosine":
            return 1.0 - v @ q
        if self.metric == "l2":
            d = v - q
            return np.sqrt(np.einsum("ij,ij->i", d, d))
        if self.metric == "dot":
            return -(v @ q)
        return np.asarray(self.distance_func(q, v), dtype=np.float64)

    def _greedy_layer(self, q: np.ndarray, start: int, layer: int) -> int:
        """ef=1 descent within one layer (paper Alg. 2 with ef=1)."""
        cur = start
        cur_d = float(self._dist(q, [cur])[0])
        improved = True
        while improved:
            improved = False
            nbrs = self.neighbors[layer].get(cur, [])
            if nbrs:
                d = self._dist(q, nbrs)
                j = int(np.argmin(d))
                if d[j] < cur_d:
                    cur, cur_d = nbrs[j], float(d[j])
                    improved = True
        return cur

    def _search_layer(self, q: np.ndarray, start: int, ef: int, layer: int, exclude=None):
        """Best-first beam search (paper Alg. 2). Returns (node, dist)
        pairs of the ef closest found, sorted ascending by dist.

        ``exclude`` nodes are traversed (they keep the graph navigable
        — the soft-delete contract) but never admitted to the result
        set; the frontier still expands past them so the beam holds ef
        REAL results (reference ``_search_base_layer``'s
        ``allow_soft_deleted=False`` behavior)."""
        import heapq

        exclude = exclude or ()
        d0 = float(self._dist(q, [start])[0])
        visited = {start}
        cand = [(d0, start)]  # min-heap of frontier
        best: list[tuple[float, int]] = []  # max-heap of result set
        if start not in exclude:
            best.append((-d0, start))
        while cand:
            d, c = heapq.heappop(cand)
            if best and d > -best[0][0] and len(best) >= ef:
                break
            new = [n for n in self.neighbors[layer].get(c, []) if n not in visited]
            if not new:
                continue
            visited.update(new)
            dists = self._dist(q, new)
            for n, dn in zip(new, dists):
                dn = float(dn)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, n))
                    if n not in exclude:
                        heapq.heappush(best, (-dn, n))
                        if len(best) > ef:
                            heapq.heappop(best)
        return sorted((-nd, n) for nd, n in best)

    def _select(self, found: list[tuple[float, int]], m: int) -> list[int]:
        return [n for _, n in found[:m]]

    def _link(self, node: int, targets: list[int], layer: int):
        cap = self.m0 if layer == 0 else self.m
        self.neighbors[layer][node] = list(targets)
        v = self.vectors[node]
        for t in targets:
            lst = self.neighbors[layer].setdefault(t, [])
            lst.append(node)
            if len(lst) > cap:  # prune to the cap by distance
                d = self._dist(self.vectors[t], lst)
                keep = np.argsort(d)[:cap]
                self.neighbors[layer][t] = [lst[i] for i in keep]

    # ------------------------------------------------------------- public
    @staticmethod
    def _norm(vectors: np.ndarray) -> np.ndarray:
        v = np.asarray(vectors, dtype=np.float64)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return v / n

    def add_batch(self, ids, vectors: np.ndarray) -> None:
        """Stage rows; indexed on the next search or explicit build().
        An id already in the index is an UPSERT (reference ``insert``
        with an existing key, ``hnsw.py:471-476``): the vector is
        replaced, a soft delete is undone, and the node's out-edges are
        repaired."""
        v = np.asarray(vectors, dtype=np.float64)
        self._rows.append(self._norm(v) if self.metric == "cosine" else v)
        self._row_ids.extend(ids)

    def build(self) -> None:
        if self.dead:
            self._compact()
        if not self._rows:
            return
        staged_v = np.concatenate(self._rows)
        staged_ids = list(self._row_ids)
        self._rows, self._row_ids = [], []
        # Split staged rows into fresh inserts vs updates; within-batch
        # duplicates: last occurrence wins (dict/mapping update order).
        last: dict = {}
        for j, key in enumerate(staged_ids):
            last[key] = j
        fresh = [(k, j) for k, j in last.items() if k not in self.id_to_idx]
        updates = [(k, j) for k, j in last.items() if k in self.id_to_idx]
        if fresh:
            base = 0 if self.vectors is None else len(self.vectors)
            block = staged_v[[j for _, j in fresh]]
            self.vectors = block if self.vectors is None else np.concatenate([self.vectors, block])
            for off, (key, _) in enumerate(fresh):
                self.ids.append(key)
                self.id_to_idx[key] = base + off
            for i in range(base, base + len(fresh)):
                self._insert(i)
        for key, j in updates:
            idx = self.id_to_idx[key]
            self.deleted.discard(idx)
            self.vectors[idx] = staged_v[j]
            self._repair(idx, self.ef_construction)

    def _insert(self, i: int) -> None:
        level = int(-math.log(max(self.rng.random(), 1e-12)) * self.ml)
        self.node_level.append(level)
        while len(self.neighbors) <= level:
            self.neighbors.append({})
        if self.entry is None:
            self.entry = i
            for lyr in range(level + 1):
                self.neighbors[lyr][i] = []
            return
        q = self.vectors[i]
        cur = self.entry
        top = self.node_level[self.entry]
        for lyr in range(top, level, -1):
            cur = self._greedy_layer(q, cur, lyr)
        for lyr in range(min(level, top), -1, -1):
            found = self._search_layer(q, cur, self.ef_construction, lyr)
            self._link(i, self._select(found, self.m0 if lyr == 0 else self.m), lyr)
            cur = found[0][1]
        if level > top:
            self.entry = i

    def search(self, q: np.ndarray, k: int = 10, ef: int | None = None):
        """Top-k for one query vector. Under cosine (the default)
        returns ``(id, similarity)``; under any other metric returns
        ``(id, distance)`` ascending — the reference's query contract.
        Soft-deleted points are traversed but never returned."""
        if self._rows or self.dead:  # staged adds/upserts or reclaimable slots
            self.build()
        if self.entry is None:
            return []
        q = np.asarray(q, dtype=np.float64)
        if self.metric == "cosine":
            nq = np.linalg.norm(q)
            if nq:
                q = q / nq
        ef = max(ef or 2 * k, k)
        cur = self.entry
        for lyr in range(self.node_level[self.entry], 0, -1):
            cur = self._greedy_layer(q, cur, lyr)
        found = self._search_layer(q, cur, ef, 0, exclude=self.deleted)
        if self.metric == "cosine":
            return [(self.ids[n], 1.0 - d) for d, n in found[:k]]
        return [(self.ids[n], d) for d, n in found[:k]]

    # ------------------------------------------------- maintenance surface
    def _repair(self, idx: int, ef: int, exclude_idx: int | None = None) -> None:
        """Re-select ``idx``'s out-going edges at every one of its
        layers by a fresh descent-and-beam search (reference
        ``_repair_connections``, ``hnsw.py:564-603``). ``exclude_idx``
        (a node being hard-removed) is traversed — it still has edges —
        but never linked to. Soft-deleted nodes remain linkable, same
        as the reference's ``allow_soft_deleted=True`` repair/insert
        searches. Neighbors' edge lists need no touch-up: edges store
        no cached distances in this structure."""
        q = self.vectors[idx]
        excl = {idx} if exclude_idx is None else {idx, exclude_idx}
        # soft-removing an entry point can pop its top layers
        level = min(self.node_level[idx], len(self.neighbors) - 1)
        cur = self.entry
        if cur is None:
            return
        if cur == idx:  # repairing the entry itself: start from a neighbor
            cur = next(
                (n for lyr in range(level, -1, -1) for n in self.neighbors[lyr].get(idx, []) if n != exclude_idx),
                None,
            )
            if cur is None:
                return
        for lyr in range(self.node_level[cur], level, -1):
            cur = self._greedy_layer(q, cur, lyr)
        for lyr in range(min(level, self.node_level[cur]), -1, -1):
            found = self._search_layer(q, cur, ef + 1, lyr, exclude=excl)
            if found:
                self.neighbors[lyr][idx] = self._select(
                    found, self.m0 if lyr == 0 else self.m
                )
                cur = found[0][1]

    def remove(self, key, hard: bool = False, ef: int | None = None) -> None:
        """Soft (default) or hard remove (reference ``remove``,
        ``hnsw.py:821-959``; hnswlib issue #4 semantics). Soft: the
        point stops being returned by queries but keeps carrying
        traffic in graph traversal. Hard: in-edges of every node
        pointing at it are re-selected (excluding it), the node is
        detached, and its id leaves the index — a second hard remove
        raises KeyError. Removing the entry point re-assigns the entry
        to another live node in the highest populated layer; removing
        the only point clears the index."""
        self.build()
        idx = self.id_to_idx.get(key)
        if idx is None:
            raise KeyError(key)
        ef = ef or self.ef_construction
        if self.entry == idx:
            new_entry = None
            for lyr in range(len(self.neighbors) - 1, -1, -1):
                new_entry = next(
                    (p for p in self.neighbors[lyr] if p != idx and p not in self.deleted),
                    None,
                )
                if new_entry is not None:
                    break
                if lyr > 0:  # layer empties with the removal
                    self.neighbors.pop()
            if new_entry is None:
                self._clear()
                return
            self.entry = new_entry
        self.deleted.add(idx)
        if not hard:
            return
        rev = set()
        for layer in self.neighbors:
            for u, nbrs in layer.items():
                if u != idx and idx in nbrs:
                    rev.add(u)
        for u in rev:
            self._repair(u, ef, exclude_idx=idx)
        for layer in self.neighbors:
            layer.pop(idx, None)
            for u in rev:  # repair re-selects; belt-and-braces drop stragglers
                if u in layer and idx in layer[u]:
                    layer[u] = [n for n in layer[u] if n != idx]
        self.deleted.discard(idx)
        self.dead.add(idx)
        del self.id_to_idx[key]
        self.ids[idx] = None

    def clean(self, ef: int | None = None) -> None:
        """Hard-remove every soft-removed point (reference ``clean``)."""
        self.build()
        for key in [self.ids[i] for i in sorted(self.deleted)]:
            self.remove(key, hard=True, ef=ef)

    def insert(self, key, vector: np.ndarray) -> None:
        """Single-point insert-or-update (reference ``insert``)."""
        self.add_batch([key], np.asarray(vector, dtype=np.float64)[None, :])
        self.build()

    def serialize(self) -> bytes:
        """Persist the index (reference parity: every reference index
        pickles — ``datasketch/minhash.py:529-541``; its HNSW tests
        pickle round-trip). Staged rows are flushed (``build``) first so
        the wire state is exactly the searchable graph, including the
        RNG state — inserts after a restore draw the same levels an
        uninterrupted index would. A custom ``distance_func`` must be a
        picklable module-level callable."""
        import pickle

        self.build()
        state = {
            "format": 1,
            "m": self.m,
            "ef_construction": self.ef_construction,
            "metric": self.metric,
            "distance_func": self.distance_func,
            "rng_state": self.rng.bit_generator.state,
            "vectors": self.vectors,
            "ids": self.ids,
            "deleted": sorted(self.deleted),
            "neighbors": self.neighbors,
            "node_level": self.node_level,
            "entry": self.entry,
        }
        return pickle.dumps(state, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def deserialize(cls, buf: bytes) -> "HnswIndex":
        """Inverse of :func:`serialize`: a fully queryable, fully
        maintainable index (insert/remove/merge keep working)."""
        import pickle

        st = pickle.loads(buf)
        out = cls(
            m=st["m"],
            ef_construction=st["ef_construction"],
            metric=st["metric"] if st["distance_func"] is None else "cosine",
            distance_func=st["distance_func"],
        )
        out.rng.bit_generator.state = st["rng_state"]
        out.vectors = st["vectors"]
        out.ids = list(st["ids"])
        out.id_to_idx = {k: i for i, k in enumerate(out.ids) if k is not None}
        out.deleted = set(st["deleted"])
        out.neighbors = st["neighbors"]
        out.node_level = list(st["node_level"])
        out.entry = st["entry"]
        return out

    def copy(self) -> "HnswIndex":
        """Deep copy with identical graph and random state."""
        out = HnswIndex(
            m=self.m,
            ef_construction=self.ef_construction,
            metric=self.metric if self.distance_func is None else "cosine",
            distance_func=self.distance_func,
        )
        out.rng.bit_generator.state = self.rng.bit_generator.state
        out.vectors = None if self.vectors is None else self.vectors.copy()
        out._rows = [r.copy() for r in self._rows]
        out._row_ids = list(self._row_ids)
        out.ids = list(self.ids)
        out.id_to_idx = dict(self.id_to_idx)
        out.deleted = set(self.deleted)
        out.dead = set(self.dead)
        out.neighbors = [{u: list(nbrs) for u, nbrs in layer.items()} for layer in self.neighbors]
        out.node_level = list(self.node_level)
        out.entry = self.entry
        return out

    def merge(self, other: "HnswIndex") -> "HnswIndex":
        """New index with all live points from both; on a duplicate id
        the OTHER index's point wins (reference ``merge``,
        ``hnsw.py:973-1008`` = copy + update)."""
        out = self.copy()
        out.build()
        other.build()
        live = [i for i, key in enumerate(other.ids) if key is not None and i not in other.deleted]
        if live:
            out.add_batch([other.ids[i] for i in live], other.vectors[live])
            out.build()
        return out

    def _clear(self) -> None:
        self.vectors = None
        self._rows, self._row_ids = [], []
        self.ids, self.id_to_idx = [], {}
        self.deleted, self.dead = set(), set()
        self.neighbors = [{}]
        self.node_level = []
        self.entry = None

    def _compact(self) -> None:
        """Reclaim hard-removed slots: drop dead rows and remap indices."""
        keep = [i for i in range(len(self.ids)) if i not in self.dead]
        remap = {old: new for new, old in enumerate(keep)}
        self.vectors = self.vectors[keep] if self.vectors is not None else None
        self.ids = [self.ids[i] for i in keep]
        self.node_level = [self.node_level[i] for i in keep]
        self.id_to_idx = {key: remap[i] for key, i in self.id_to_idx.items()}
        self.deleted = {remap[i] for i in self.deleted}
        self.neighbors = [
            {remap[u]: [remap[n] for n in nbrs] for u, nbrs in layer.items() if u not in self.dead}
            for layer in self.neighbors
        ]
        self.entry = None if self.entry is None else remap[self.entry]
        self.dead = set()
