"""Deduplication operators over ray.data Datasets.

- exact dedup: content-hash groupby, keep min-id row (also the
  pre-collapse pass that defuses LSH bucket skew — SURVEY.md §4.2)
- substring dedup: anchor-window groupby + per-group suffix-array /
  direct containment (raydedup.suffix)
- the MinHash/SimHash near-dup paths live in stages/bands.py and are
  composed by pipeline.py; this module adds the n-gram-Jaccard
  brute-verify and embedding-cosine near-dup operators used by the
  training-data query surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------- exact dedup
def add_content_hash(batch: pa.Table, cols: list[str], out_col: str = "content_hash") -> pa.Table:
    """Vectorized-ish content hash (SHA1 hex of the concatenated column
    reprs). SHA1 must run per row; columns are pre-rendered with Arrow
    kernels so the loop touches plain bytes only.

    NULL values render as a type-prefix sentinel (``\\x00``) distinct
    from any real string (``\\x01`` + value), so a NULL cell and an
    empty string never hash together — matching SQL GROUP BY semantics
    where NULLs form their own group separate from ''."""
    rendered = [pc.cast(batch.column(c), pa.string()).to_pylist() for c in cols]
    hashes = [
        hashlib.sha1(
            "\x1f".join("\x00" if v is None else "\x01" + v for v in row).encode("utf-8")
        ).hexdigest()
        for row in zip(*rendered)
    ]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def exact_dedup(ds, key_cols: list[str], id_col: str, keep_payload: bool = True, num_partitions: int = 32):
    """Keep one representative (min id) per identical content.

    hash in map_batches (cheap, parallel) → hash-partition on
    content_hash → per-run min-id (stages/grouped.py: one Python call
    per partition, not per group). Only the hash + id transit the
    shuffle unless ``keep_payload`` (then whole rows minus any
    pre-dropped blobs)."""
    from raydedup.stages.grouped import ensure_hash_shuffle, effective_partitions

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, key_cols), batch_format="pyarrow"
    )
    if not keep_payload:
        hashed = hashed.select_columns(["content_hash", id_col])

    ensure_hash_shuffle()
    parted = hashed.repartition(
        effective_partitions(num_partitions), keys=["content_hash"]
    )

    def keep_min_per_run(block: pa.Table) -> pa.Table:
        if len(block) == 0:
            return block
        block = block.sort_by([("content_hash", "ascending")])
        h = block.column("content_hash").to_numpy(zero_copy_only=False)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        change = np.nonzero(h[1:] != h[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(h)]))
        keep = np.array(
            [s + np.argmin(ids[s:e]) for s, e in zip(starts, ends)], dtype=np.int64
        )
        return block.take(pa.array(keep))

    return parted.map_batches(keep_min_per_run, batch_size=None, batch_format="pyarrow")


def exact_dup_pairs(ds, key_cols: list[str], id_col: str, num_partitions: int = 32):
    """(id_a < id_b) pairs of rows with identical content — each group
    emits a star from its min id (component-equivalent)."""
    from raydedup.stages.grouped import map_key_runs

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, key_cols), batch_format="pyarrow"
    ).select_columns(["content_hash", id_col])

    def star_runs(block: pa.Table, starts, ends) -> pa.Table:
        typ = block.column(id_col).type
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            run = np.unique(ids[s:e])
            if len(run) < 2:
                continue
            out_a.append(np.repeat(run[:1], len(run) - 1))
            out_b.append(run[1:])
        if out_a:
            return pa.table(
                {"id_a": pa.array(np.concatenate(out_a), typ), "id_b": pa.array(np.concatenate(out_b), typ)}
            )
        return pa.table({"id_a": pa.array([], typ), "id_b": pa.array([], typ)})

    return map_key_runs(hashed, "content_hash", star_runs, num_partitions)


# ------------------------------------------------------------ substring dedup
def substring_pairs(ds, id_col: str, text_col: str, window: int = 4, num_partitions: int = 32):
    """(contained_id → id_a, container_id → id_b) pairs where one
    caption is a strict token-slice of another.

    Shape: every doc emits one *query* row (anchor = its first
    ``window``-token window) and one *container* row per token window;
    groupby(anchor) co-locates candidates; per-group containment runs a
    generalized suffix array (large groups) or direct find. Docs shorter
    than ``window`` tokens are collected to the driver (tiny) and
    broadcast-checked — completeness, not a hot path."""
    import ray
    from raydedup.stages.grouped import map_key_runs, unique_rows_partitioned
    from raydedup.suffix import containment_pairs_in_group, window_anchor_hashes

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        memo: dict = {}
        a_ids, a_anchor, a_role, a_text = [], [], [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split()
            if len(toks) < window:
                continue  # short docs via the broadcast path
            anchors = window_anchor_hashes(toks, window, memo)
            a_ids.append(i)
            a_anchor.append(anchors[0])  # query row: leading window
            a_role.append(0)
            a_text.append(t)
            a_ids.extend([i] * len(anchors))
            a_anchor.extend(anchors.tolist())
            a_role.extend([1] * len(anchors))
            a_text.extend([t] * len(anchors))
        return pa.table(
            {
                "anchor": pa.array(a_anchor, pa.uint64()),
                "role": pa.array(a_role, pa.int8()),
                id_col: pa.array(a_ids, batch.column(id_col).type),
                text_col: pa.array(a_text, pa.string()),
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow")

    def per_runs(block: pa.Table, starts, ends) -> pa.Table:
        typ = block.column(id_col).type
        roles = block.column("role").to_numpy(zero_copy_only=False)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        texts = None
        for s, e in zip(starts, ends):
            rr = roles[s:e]
            if not (rr == 0).any() or len(np.unique(ids[s:e])) < 2:
                continue  # no query in this anchor group, or single doc
            if texts is None:  # lazy — most blocks never need the strings
                texts = block.column(text_col).to_pylist()
            # Dedupe by DISTINCT text before matching: exact-duplicate
            # floods (the skew probe) otherwise turn one run into an
            # m×m suffix-array scan. Verified (qtext, ctext) pairs are
            # expanded back to all id combinations afterwards.
            q_ids: dict = {}
            c_ids: dict = {}
            for k in range(s, e):
                t = texts[k]
                bucket = q_ids if roles[k] == 0 else c_ids
                bucket.setdefault(t, set()).add(ids[k])
            tpairs = containment_pairs_in_group(
                sorted((t, t) for t in q_ids), sorted((t, t) for t in c_ids)
            )
            for qt, ct in tpairs:
                for qi in q_ids[qt]:
                    for ci in c_ids[ct]:
                        if qi != ci:
                            out_a.append(qi)
                            out_b.append(ci)
        return pa.table({"id_a": pa.array(out_a, typ), "id_b": pa.array(out_b, typ)})

    pairs = map_key_runs(exploded, "anchor", per_runs, num_partitions)

    # short-query completeness path: collect docs with < window tokens
    short = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: t.filter(
            pc.less(pc.count_substring_regex(t.column(text_col), r"\S+"), window)
        ),
        batch_format="pyarrow",
    )
    short_rows = short.take_all()
    if short_rows:
        ref = ray.put([(r[id_col], r[text_col]) for r in short_rows])

        def scan(batch: pa.Table) -> pa.Table:
            shorts = ray.get(ref)
            a, b = [], []
            for cid, ccap in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
                padded = f" {ccap} "
                for qid, qcap in shorts:
                    if qid != cid and len(qcap) < len(ccap or "") and f" {qcap} " in padded:
                        a.append(qid)
                        b.append(cid)
            typ = batch.column(id_col).type
            return pa.table({"id_a": pa.array(a, typ), "id_b": pa.array(b, typ)})

        pairs = pairs.union(
            ds.select_columns([id_col, text_col]).map_batches(scan, batch_format="pyarrow")
        )

    return unique_rows_partitioned(pairs, ["id_a", "id_b"], num_partitions)


# -------------------------------------------------- n-gram Jaccard (AllPairs)
def ngram_jaccard_pairs(ds, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5):
    """EXACT n-gram-Jaccard near-dup pairs via prefix filtering
    (AllPairs / PPJoin, Bayardo et al. WWW'07): order each doc's shingle
    set by ascending global document frequency; any pair with
    J ≥ t must share a shingle within the first
    ``floor(len*(1-t)) + 1`` shingles of that order. Only prefix
    shingles are exploded into the groupby, bounding hot groups to
    rare-ish shingles; exact Jaccard is then verified from the full
    shingle sets carried on the candidate rows.

    The DF table is collected to the driver and broadcast (``ray.put``):
    it is |distinct shingles| rows — fine up to ~10^8; beyond that,
    switch the ordering to hashed-DF buckets (documented tradeoff).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    import ray
    from ray.data.aggregate import Count
    from raydedup.hashing import word_ngram_shingles

    slim = ds.select_columns([id_col, text_col])

    def explode_shingles(batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            for s in word_ngram_shingles(t or "", n=n):
                ids.append(i)
                sh.append(s.decode("utf-8"))
        return pa.table({id_col: pa.array(ids, batch.column(id_col).type), "sh": pa.array(sh, pa.string())})

    df = (
        slim.map_batches(explode_shingles, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Count(alias_name="df"))
    )
    df_rows = df.take_all()
    # rare-first deterministic order: (df, shingle)
    order = {r["sh"]: k for k, r in enumerate(sorted(df_rows, key=lambda r: (r["df"], r["sh"])))}
    order_ref = ray.put(order)

    def prefix_explode(batch: pa.Table) -> pa.Table:
        rank = ray.get(order_ref)
        ids, anchors, sets = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            sh = sorted(
                (s.decode("utf-8") for s in word_ngram_shingles(t or "", n=n)),
                key=lambda s: rank.get(s, 1 << 60),
            )
            if not sh:
                continue
            plen = int(len(sh) * (1.0 - threshold)) + 1
            joined = "\x1f".join(sh)
            for s in sh[:plen]:
                ids.append(i)
                # 64-bit anchor hash → slim uint64 shuffle key (a
                # collision only merges two groups, adding candidate
                # checks, never losing a pair)
                anchors.append(struct.unpack("<Q", hashlib.sha1(s.encode("utf-8")).digest()[:8])[0])
                sets.append(joined)
        return pa.table(
            {
                id_col: pa.array(ids, batch.column(id_col).type),
                "anchor": pa.array(anchors, pa.uint64()),
                "shset": pa.array(sets, pa.string()),
            }
        )

    exploded = slim.map_batches(prefix_explode, batch_format="pyarrow")

    from raydedup.stages.grouped import map_key_runs, unique_rows_partitioned

    def pairs_in_runs(block: pa.Table, starts, ends) -> pa.Table:
        typ = block.column(id_col).type
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        sets = None
        a_out, b_out, j_out = [], [], []
        for s, e in zip(starts, ends):
            if sets is None:
                sets = block.column("shset").to_pylist()
            uniq = {}
            for k in range(s, e):
                uniq[ids[k]] = sets[k]
            items = sorted(uniq.items())
            for x in range(len(items) - 1):
                ia, sa = items[x]
                seta = set(sa.split("\x1f"))
                for y in range(x + 1, len(items)):
                    ib, sb = items[y]
                    setb = set(sb.split("\x1f"))
                    union = len(seta | setb)
                    j = len(seta & setb) / union if union else 0.0
                    if j >= threshold:
                        a_out.append(ia)
                        b_out.append(ib)
                        j_out.append(j)
        return pa.table(
            {
                "id_a": pa.array(a_out, typ),
                "id_b": pa.array(b_out, typ),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    pairs = map_key_runs(exploded, "anchor", pairs_in_runs, 32)
    # jaccard is exact, so duplicates across anchors agree — row-unique
    return unique_rows_partitioned(pairs, ["id_a", "id_b", "jaccard"], 32)


# ------------------------------------------- exact embedding cosine near-dups
def embedding_near_dup_exact(ds, threshold: float, id_col: str = "vec_id", emb_col: str = "embedding"):
    """EXACT cosine near-dup pairs by broadcasting the (normalized)
    embedding matrix once and scanning batches against it — the
    small-side-broadcast pattern. Right-sized for corpora whose
    embedding matrix fits a worker (~10^6 × 64 floats = 0.5 GB);
    beyond that use stages.ann.embedding_near_dup_pairs (LSH-bucketed).
    Returns (id_a, id_b) with id_a < id_b."""
    import ray
    from raydedup.stages.ann import _emb_matrix, _normalize

    rows = ds.select_columns([id_col, emb_col]).take_all()
    all_ids = np.array([r[id_col] for r in rows])
    mat = _normalize(np.array([r[emb_col] for r in rows], dtype=np.float64))
    ref = ray.put((all_ids, mat))

    def scan(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cos = m @ m_all.T
        keep = cos >= threshold
        a_idx, b_idx = np.nonzero(keep)
        ia, ib = ids[a_idx], ids_all[b_idx]
        mask = ia < ib  # strict order also drops self-pairs
        return pa.table({"id_a": pa.array(ia[mask]), "id_b": pa.array(ib[mask])})

    return ds.select_columns([id_col, emb_col]).map_batches(scan, batch_format="pyarrow", batch_size=2048)


# ------------------------------------------------ index maintenance ops
def remove_ids(ds, ids_to_remove, id_col: str):
    """Deletion (reference ``MinHashLSH.remove``, ``lsh.py:497-528``):
    here an anti-join — broadcast the removal id set once, filter every
    table (signature/band/pair) that carries the id. Removing from a
    table-shaped index never mutates shared state."""
    import ray

    ref = ray.put(frozenset(ids_to_remove))

    def drop(batch: pa.Table) -> pa.Table:
        gone = ray.get(ref)
        keep = [v not in gone for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop, batch_format="pyarrow")


def merge_band_tables(*band_tables):
    """Index merge (reference ``MinHashLSH.merge``, ``lsh.py:233-251``):
    union of band tables built with identical (seed, num_perm, b, r) —
    trivially parallel, no rehashing."""
    out = band_tables[0]
    for t in band_tables[1:]:
        out = out.union(t)
    return out
