"""Mergeable Misra–Gries heavy-hitters summary + Ray AggregateFn.

The frequent-items member of the sketch family (MinHash / HLL / Bloom /
count-min / KLL): a fixed-size (≤ k entries) summary of a categorical
stream whose stored counts undercount true counts by a provable,
*tracked* amount, mergeable by counter-union + re-compression.

Public-knowledge provenance: Misra & Gries, "Finding repeated
elements" (Sci. Comp. Programming, 1982); the mergeability rule —
union the counters, then subtract the (k+1)-th largest count from all
and drop the non-positive — is Agarwal, Cormode, Huang, Phillips, Wei,
Yi, "Mergeable Summaries" (PODS 2012, §3). The summary tracks the
TOTAL amount ever subtracted (``dec``), giving exact per-item
guarantees at read time with no analytic slack:

  - retained item x:  stored(x) ≤ true(x) ≤ stored(x) + dec
  - dropped  item x:  true(x) ≤ dec
  - and always        dec ≤ n / (k + 1)

Batch updates compress through the same rule (an exact per-block
``value_counts`` is a weighted counter union), so accumulate and merge
share one kernel. States travel as Arrow ``binary`` — same distributed
shape as ``hll_aggregate_fn`` / ``kll_aggregate_fn``.
"""

from __future__ import annotations

import struct

import numpy as np


class MisraGries:
    def __init__(self, k: int = 64, items: dict | None = None, dec: int = 0, n: int = 0):
        self.k = int(k)
        self.items: dict[bytes, int] = items if items is not None else {}
        self.dec = int(dec)  # total decrement ever applied
        self.n = int(n)  # total stream weight seen

    # ------------------------------------------------------------ update
    def update_counts(self, terms, counts) -> "MisraGries":
        """Weighted counter union (terms: iterable of bytes/str, counts:
        int array) followed by one compression — the batch form of the
        classic one-item update (identical guarantees, PODS'12 §3)."""
        it = self.items
        for t, c in zip(terms, counts):
            tb = t.encode("utf-8") if isinstance(t, str) else bytes(t)
            it[tb] = it.get(tb, 0) + int(c)
        self.n += int(np.sum(counts)) if len(counts) else 0
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        it = self.items
        for tb, c in other.items.items():
            it[tb] = it.get(tb, 0) + c
        self.dec += other.dec
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.items) <= self.k:
            return
        vals = np.fromiter(self.items.values(), dtype=np.int64, count=len(self.items))
        # d = (k+1)-th largest stored count; subtracting it leaves ≤ k
        # strictly-positive entries
        d = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.items = {tb: c - d for tb, c in self.items.items() if c > d}
        self.dec += d

    # ------------------------------------------------------------- reads
    def top(self, m: int) -> list[tuple[bytes, int]]:
        """Top-``m`` retained items by (stored desc, term asc)."""
        return sorted(self.items.items(), key=lambda kv: (-kv[1], kv[0]))[:m]

    # -------------------------------------------------------------- wire
    def to_bytes(self) -> bytes:
        parts = [struct.pack("<IQQI", self.k, self.dec, self.n, len(self.items))]
        for tb, c in self.items.items():
            parts.append(struct.pack("<QI", c, len(tb)))
            parts.append(tb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        k, dec, n, m = struct.unpack_from("<IQQI", blob, 0)
        off = struct.calcsize("<IQQI")
        items: dict[bytes, int] = {}
        for _ in range(m):
            c, ln = struct.unpack_from("<QI", blob, off)
            off += struct.calcsize("<QI")
            items[blob[off : off + ln]] = c
            off += ln
        return cls(k=k, items=items, dec=dec, n=n)


def mg_aggregate_fn(token_col: str, count_col: str, k: int = 64, alias_name: str | None = None):
    """``AggregateFn`` building a Misra–Gries state over pre-counted
    (token, count) partial rows (the map-side ``value_counts`` pattern —
    blocks arrive already token-deduped, so accumulate is one weighted
    union + compression per block). Finalize returns the wire bytes."""
    from ray.data.aggregate import AggregateFn

    name = alias_name or f"mg({token_col})"

    def accumulate_block(state: bytes, block) -> bytes:
        sk = MisraGries.from_bytes(state)
        toks = block.column(token_col) if hasattr(block, "column") else block[token_col]
        cnts = block.column(count_col) if hasattr(block, "column") else block[count_col]
        sk.update_counts(toks.to_pylist(), cnts.to_numpy(zero_copy_only=False))
        return sk.to_bytes()

    return AggregateFn(
        init=lambda _k: MisraGries(k).to_bytes(),
        accumulate_block=accumulate_block,
        merge=lambda a, b: MisraGries.from_bytes(a).merge(MisraGries.from_bytes(b)).to_bytes(),
        finalize=lambda st: st,
        name=name,
    )
