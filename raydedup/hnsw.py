"""HNSW approximate-nearest-neighbor index (Malkov & Yashunin, TPAMI
2018 — implemented from the paper's Alg. 1-5, not ported from the
reference ``datasketch/hnsw.py``; same role as reference ``HNSW`` but a
different, numpy-centric structure).

Single-shard index used by the distributed path in ``stages/ann.py``:
one ``HnswIndex`` per shard actor, queries fan out and merge. Distance
computations are counted (``n_dist``) so recall/efficiency versus brute
force is measurable (the reference's own test strategy,
``test/test_hnsw.py``).

Cosine metric over L2-normalized vectors: distance = 1 − dot.
"""

from __future__ import annotations

import math

import numpy as np


class HnswIndex:
    def __init__(self, m: int = 16, ef_construction: int = 100, seed: int = 1):
        self.m = m
        self.m0 = 2 * m
        self.ml = 1.0 / math.log(m)
        self.ef_construction = ef_construction
        self.rng = np.random.default_rng(seed)
        self.vectors: np.ndarray | None = None  # (n, d), normalized
        self._rows: list[np.ndarray] = []
        self.ids: list = []
        # neighbors[layer][node] -> list[int]; layer 0 exists for all
        self.neighbors: list[dict[int, list[int]]] = [{}]
        self.node_level: list[int] = []
        self.entry: int | None = None
        self.n_dist = 0

    # ---------------------------------------------------------- internals
    def _dist(self, q: np.ndarray, nodes: list[int]) -> np.ndarray:
        self.n_dist += len(nodes)
        return 1.0 - self.vectors[nodes] @ q

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

    def _search_layer(self, q: np.ndarray, start: int, ef: int, layer: int):
        """Best-first beam search (paper Alg. 2). Returns (node, dist)
        pairs of the ef closest found, sorted ascending by dist."""
        import heapq

        d0 = float(self._dist(q, [start])[0])
        visited = {start}
        cand = [(d0, start)]  # min-heap of frontier
        best: list[tuple[float, int]] = [(-d0, start)]  # max-heap of result set
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
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
    def add_batch(self, ids, vectors: np.ndarray) -> None:
        """Stage rows; index built on the first search or explicit build()."""
        v = np.asarray(vectors, dtype=np.float64)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1.0
        self._rows.append(v / n)
        self.ids.extend(ids)

    def build(self) -> None:
        if not self._rows:
            return
        new = np.concatenate(self._rows)
        self._rows = []
        base = 0 if self.vectors is None else len(self.vectors)
        self.vectors = new if self.vectors is None else np.concatenate([self.vectors, new])
        for i in range(base, len(self.vectors)):
            self._insert(i)

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
        """Top-k (id, cosine) for one query vector."""
        if self.vectors is None or self.entry is None:
            self.build()
        if self.entry is None:
            return []
        q = np.asarray(q, dtype=np.float64)
        nq = np.linalg.norm(q)
        if nq:
            q = q / nq
        ef = max(ef or 2 * k, k)
        cur = self.entry
        for lyr in range(self.node_level[self.entry], 0, -1):
            cur = self._greedy_layer(q, cur, lyr)
        found = self._search_layer(q, cur, ef, 0)
        return [(self.ids[n], 1.0 - d) for d, n in found[:k]]
