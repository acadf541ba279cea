"""Top-k similarity search and containment search over signature tables.

Re-expresses the reference's two query-time indexes Ray-Data-first:

- ``MinHashLSHForest`` top-k (``lshforest.py:74-128``): prefix-match
  candidate generation + ranking. Here: broadcast the query signatures
  once, scan the signature table with a vectorized slot-equality
  estimate per batch, keep per-batch top-k, merge globally — exact
  top-k under the MinHash estimate (a strict superset of the forest's
  prefix recall), one pass, no index build.
- ``MinHashLSHEnsemble`` containment (``lshensemble.py:137-249``):
  size-partitioned banded LSH with per-partition (b, r) tuned to the
  containment threshold (integrals ``lshensemble.py:17-58``). Here the
  partitions are log-size ranges of the *container* side; each
  partition band-explodes with its own (b, r) and queries probe every
  partition with the matching prefix bands — the same groupby-shuffle
  machinery as plain LSH. An exact prefix-filtered containment join
  (AllPairs-style) is provided for SQL-checkable semantics.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from raydedup.params import _integrate


# ----------------------------------------------------- forest-style top-k
def topk_similar(sig_ds, query_sigs: np.ndarray, query_ids, k: int = 10, id_col: str = "image_id", num_perm: int = 128):
    """Top-k rows by estimated Jaccard against each query signature.

    Returns a Dataset (query_id, {id_col}, jaccard), k rows per query,
    ties broken by id. Self-matches are kept (callers filter)."""
    import ray

    from raydedup.schema import sig_to_numpy
    from raydedup.stages.grouped import tune_for_session

    tune_for_session(sig_ds)
    q = np.ascontiguousarray(query_sigs, dtype=np.uint64)
    qref = ray.put((q, list(query_ids)))

    def score(batch: pa.Table) -> pa.Table:
        qm, qids = ray.get(qref)
        sig = sig_to_numpy(batch.column("minhash"), num_perm)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_id, out_j = [], [], []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            est = np.mean(sig == qm[qi], axis=1)
            top = np.argpartition(-est, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            out_q.extend([qids[qi]] * len(top))
            out_id.extend(ids[top].tolist())
            out_j.extend(est[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(out_id),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    scored = sig_ds.map_batches(score, batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        j = group.column("jaccard").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -j))[: min(k, len(j))]
        return group.take(pa.array(order))

    return scored.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# -------------------------------------------- exact containment (AllPairs)
def containment_pairs_exact(ds, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5, num_partitions: int | None = None):
    """EXACT pairs with shingle containment |A∩B|/|A| ≥ threshold.

    Prefix filter on the contained side only (containment is
    asymmetric): A must share one of its ⌊|A|(1−t)⌋+1 rarest shingles
    with B, while B contributes every shingle. Same scale shape as
    ``ngram_jaccard_pairs``: count-min-sketch DF order (broadcast,
    fixed size), slim (anchor: uint64, id, role) inverted-index rows,
    and set verification AFTER candidate dedupe via the packed-blob
    pair join (stages/dedup._pair_set_verify). Returns (id_a=contained,
    id_b=container, containment)."""
    import ray

    from raydedup.cms import CountMinSketch, shingle_df_sketch_aggregate
    from raydedup.hashing import hash_bytes64, word_ngram_shingles
    from raydedup.stages.dedup import _pair_set_verify
    from raydedup.stages.grouped import auto_partitions, ensure_hash_shuffle, map_key_runs

    ensure_hash_shuffle()
    slim = ds.select_columns([id_col, text_col])
    id_type = ds.schema().base_schema.field(id_col).type
    if num_partitions is None:
        num_partitions = auto_partitions(slim)

    cms_counts = slim.aggregate(shingle_df_sketch_aggregate(text_col, n))["shingle_df_cms"]
    cms_ref = ray.put(cms_counts)

    def explode_roles(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(counts=ray.get(cms_ref))
        memo: dict = {}
        out_id, out_anchor, out_role = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            sh = word_ngram_shingles(t or "", n=n)
            if not sh:
                continue
            hs = np.unique(hash_bytes64(sorted(sh), memo))
            df = cms.estimate(hs)
            order = np.lexsort((hs, df))
            plen = int(len(hs) * (1.0 - threshold)) + 1
            pre = hs[order[:plen]]
            out_id.extend([i] * (len(pre) + len(hs)))
            out_anchor.append(pre)  # contained-side prefix
            out_anchor.append(hs)  # container-side: all shingles
            out_role.append(np.zeros(len(pre), np.int8))
            out_role.append(np.ones(len(hs), np.int8))
        anchors = np.concatenate(out_anchor) if out_anchor else np.empty(0, np.uint64)
        roles = np.concatenate(out_role) if out_role else np.empty(0, np.int8)
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "anchor": pa.array(anchors, pa.uint64()),
                "role": pa.array(roles, pa.int8()),
            }
        )

    exploded = slim.map_batches(explode_roles, batch_format="pyarrow")

    def per_runs(block: pa.Table, starts, ends) -> pa.Table:
        roles = block.column("role").to_numpy(zero_copy_only=False)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            rr = roles[s:e]
            run_ids = ids[s:e]
            qs = np.unique(run_ids[rr == 0])
            cs = np.unique(run_ids[rr == 1])
            if len(qs) == 0 or len(cs) == 0:
                continue
            a = np.repeat(qs, len(cs))
            b = np.tile(cs, len(qs))
            keep = a != b
            out_a.append(a[keep])
            out_b.append(b[keep])
        if out_a:
            a, b = np.concatenate(out_a), np.concatenate(out_b)
        else:
            a = b = []
        return pa.table({"id_a": pa.array(a, id_type), "id_b": pa.array(b, id_type)})

    pairs = map_key_runs(exploded, "anchor", per_runs, num_partitions)

    def containment(sa: np.ndarray, sb: np.ndarray) -> float:
        if len(sa) == 0:
            return 0.0
        return len(np.intersect1d(sa, sb, assume_unique=True)) / len(sa)

    return _pair_set_verify(
        pairs, slim, id_col, text_col, n, num_partitions, "containment", containment, threshold
    )


# ---------------------------------------- LSH-Ensemble-style approximation
def _containment_fp(threshold, b, r, xq):
    f = lambda t: 1 - (1 - (t / (1 + xq - t)) ** float(r)) ** float(b)
    hi = threshold if xq >= threshold else xq
    return _integrate(f, 0.0, hi)


def _containment_fn(threshold, b, r, xq):
    f = lambda t: (1 - (t / (1 + xq - t)) ** float(r)) ** float(b)
    if xq >= 1.0:
        return _integrate(f, threshold, 1.0)
    if xq >= threshold:
        return _integrate(f, threshold, xq)
    return 0.0


@lru_cache(maxsize=None)
def optimal_containment_param(threshold: float, num_perm: int, max_r: int, xq: float, wfp: float = 0.5, wfn: float = 0.5):
    """(b, r) minimizing weighted containment FP/FN (reference
    ``lshensemble.py:41-58``), numpy quadrature instead of scipy."""
    best = (0, 0)
    min_err = float("inf")
    for b in range(1, num_perm + 1):
        for r in range(1, min(max_r, num_perm // b) + 1):
            err = wfp * _containment_fp(threshold, b, r, xq) + wfn * _containment_fn(threshold, b, r, xq)
            if err < min_err:
                min_err = err
                best = (b, r)
    return best


def ensemble_containment_candidates(
    sig_ds,
    id_col: str,
    size_col: str,
    threshold: float = 0.5,
    num_perm: int = 128,
    num_part: int = 4,
    max_r: int = 8,
    num_partitions: int = 32,
):
    """Approximate containment candidate pairs (query ⊂ container):
    containers are split into ``num_part`` log-size partitions, each
    banded with its own (b, r) chosen at the partition's geometric-mean
    size ratio; every document probes every partition with the matching
    band layout. Returns (id_a=query, id_b=container) candidates."""
    import pyarrow.compute as pc

    from raydedup.schema import sig_to_numpy
    from raydedup.stages.bands import fold_band_buckets
    from raydedup.stages.grouped import map_key_runs, unique_rows_partitioned

    sizes = [r[size_col] for r in sig_ds.select_columns([size_col]).take_all()]
    lo, hi = max(1, min(sizes)), max(sizes)
    edges = np.unique(np.geomspace(lo, hi + 1, num_part + 1).astype(np.int64))
    mids = np.sqrt(edges[:-1] * edges[1:]).astype(np.float64)

    parts = []
    for pi in range(len(edges) - 1):
        plo, phi = int(edges[pi]), int(edges[pi + 1])
        xq = 1.0  # container/query ratio varies per query; mid-grid default
        b, r = optimal_containment_param(threshold, num_perm, max_r, float(mids[pi] / mids[0]))
        if b < 1 or r < 1:
            b, r = 2, max_r
        parts.append((plo, phi, b, r))

    def explode(batch: pa.Table) -> pa.Table:
        sig = sig_to_numpy(batch.column("minhash"), num_perm)
        ids = batch.column(id_col)
        szs = batch.column(size_col).to_numpy(zero_copy_only=False)
        out_id, out_bucket, out_role = [], [], []
        for pi, (plo, phi, b, r) in enumerate(parts):
            buckets = fold_band_buckets(sig, b, r) ^ np.uint64(0x1000003 * (pi + 1))
            idx = np.repeat(np.arange(len(batch), dtype=np.int64), b)
            in_part = (szs >= plo) & (szs < phi)
            # container rows: docs whose size falls in this partition
            cont_mask = np.repeat(in_part, b)
            # query rows: every doc probes every partition
            out_id.append(ids.take(pa.array(idx)))
            out_bucket.append(buckets)
            out_role.append(np.where(cont_mask, 1, 0).astype(np.int8))
            out_id.append(ids.take(pa.array(idx)))
            out_bucket.append(buckets)
            out_role.append(np.zeros(len(idx), dtype=np.int8))
        return pa.table(
            {
                id_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_id]),
                "bucket": pa.array(np.concatenate(out_bucket), pa.uint64()),
                "role": pa.array(np.concatenate(out_role), pa.int8()),
            }
        )

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def per_runs(block: pa.Table, starts, ends) -> pa.Table:
        typ = block.column(id_col).type
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        roles = block.column("role").to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            rr = roles[s:e]
            run_ids = ids[s:e]
            qs = np.unique(run_ids[rr == 0])
            cs = np.unique(run_ids[rr == 1])
            if len(qs) == 0 or len(cs) == 0:
                continue
            for q in qs:
                for c in cs:
                    if q != c:
                        out_a.append(q)
                        out_b.append(c)
        return pa.table({"id_a": pa.array(out_a, typ), "id_b": pa.array(out_b, typ)})

    pairs = map_key_runs(exploded, "bucket", per_runs, num_partitions)
    return unique_rows_partitioned(pairs, ["id_a", "id_b"], num_partitions)
