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

    Scale shape (round-2 redesign — the round-1 version shipped the full
    text once per token window, O(len²) bytes/doc through the shuffle):

    1. *explode* (slim): every doc emits one ~40-byte **query** row —
       anchor = the MIN window-hash over its token windows (min, not
       leading, so templated prefixes don't flood one anchor), plus
       (offset of that window, token count, whole-doc polynomial hash,
       char count) — and one ~25-byte **container** row per window
       (anchor, position). No text transits.
    2. *anchor shuffle*: per anchor run, queries are grouped into
       whole-doc-hash equivalence classes. Containers belonging to the
       query's own class are EXCLUDED up front (identical text can
       never *strictly* contain — this is what defuses the m² exact-
       duplicate flood), then each class member × external container
       row becomes a slim candidate (member, cid, start = pos-offset).
    3. *verify shuffle* (keyed by container id): candidates union the
       docs table, each text travels ONCE; a prefix-sum polynomial hash
       checks tokens[start : start+qlen] == query hash in O(1) per
       candidate, plus the strict char-length condition. Each (query,
       container) class lives in exactly one anchor run, so verified
       pairs are already globally unique — no final dedupe shuffle.

    Docs shorter than ``window`` tokens are collected to the driver
    (tiny) and broadcast-checked — completeness, not a hot path."""
    import ray
    from raydedup.stages.grouped import map_key_runs
    from raydedup.suffix import (
        poly_hash_all,
        poly_powers,
        poly_prefix_sums,
        token_hashes64,
        window_anchor_hashes,
    )

    id_type = ds.schema().base_schema.field(id_col).type

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        memo: dict = {}
        max_len = max((len((t or "").split()) for t in texts), default=1)
        bpow, _ = poly_powers(max_len)
        r_anchor, r_role, r_id, r_pos, r_qlen, r_qhash, r_qchars = [], [], [], [], [], [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split()
            L = len(toks)
            if L < window:
                continue  # short docs via the broadcast path
            hv = token_hashes64(toks, memo)
            anchors = window_anchor_hashes(toks, window, memo)
            qoff = int(anchors.argmin())
            qhash = int(poly_hash_all(hv, bpow))
            # query row
            r_anchor.append(int(anchors[qoff]))
            r_role.append(0)
            r_id.append(i)
            r_pos.append(qoff)
            r_qlen.append(L)
            r_qhash.append(qhash)
            r_qchars.append(len(t))
            # container rows: one per window, position only
            r_anchor.extend(anchors.tolist())
            r_role.extend([1] * len(anchors))
            r_id.extend([i] * len(anchors))
            r_pos.extend(range(len(anchors)))
            r_qlen.extend([0] * len(anchors))
            r_qhash.extend([0] * len(anchors))
            r_qchars.extend([0] * len(anchors))
        return pa.table(
            {
                "anchor": pa.array(r_anchor, pa.uint64()),
                "role": pa.array(r_role, pa.int8()),
                id_col: pa.array(r_id, id_type),
                "pos": pa.array(r_pos, pa.int32()),
                "qlen": pa.array(r_qlen, pa.int32()),
                "qhash": pa.array(r_qhash, pa.uint64()),
                "qchars": pa.array(r_qchars, pa.int32()),
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow")

    def emit_candidates(block: pa.Table, starts, ends) -> pa.Table:
        roles = block.column("role").to_numpy(zero_copy_only=False)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        pos = block.column("pos").to_numpy(zero_copy_only=False)
        qlen = block.column("qlen").to_numpy(zero_copy_only=False)
        qhash = block.column("qhash").to_numpy(zero_copy_only=False)
        qchars = block.column("qchars").to_numpy(zero_copy_only=False)
        o_key, o_qid, o_start, o_qlen, o_qhash, o_qchars = [], [], [], [], [], []
        for s, e in zip(starts, ends):
            rr = roles[s:e]
            qm = rr == 0
            cm = ~qm
            if not qm.any() or not cm.any():
                continue
            run_ids = ids[s:e]
            c_ids = run_ids[cm]
            c_pos = pos[s:e][cm]
            # equivalence classes of queries by whole-doc hash
            q_hashes = qhash[s:e][qm]
            q_ids = run_ids[qm]
            q_offs = pos[s:e][qm]
            q_lens = qlen[s:e][qm]
            q_chars = qchars[s:e][qm]
            uniq, first, inv = np.unique(q_hashes, return_index=True, return_inverse=True)
            for u in range(len(uniq)):
                members = np.unique(q_ids[inv == u])
                start = c_pos - q_offs[first[u]]
                # same-class containers (identical text) can never
                # strictly contain — excluding them here is what keeps
                # exact-duplicate floods from emitting m² candidates
                ok = (start >= 0) & ~np.isin(c_ids, members)
                if not ok.any():
                    continue
                n = int(ok.sum())
                ks = c_ids[ok].tolist()
                ss = start[ok].tolist()
                for m in members:
                    o_key.extend(ks)
                    o_qid.extend([m] * n)
                    o_start.extend(ss)
                    o_qlen.extend([int(q_lens[first[u]])] * n)
                    o_qhash.extend([int(q_hashes[first[u]])] * n)
                    o_qchars.extend([int(q_chars[first[u]])] * n)
        return pa.table(
            {
                "key": pa.array(o_key, id_type),
                "qid": pa.array(o_qid, id_type),
                "start": pa.array(o_start, pa.int32()),
                "qlen": pa.array(o_qlen, pa.int32()),
                "qhash": pa.array(o_qhash, pa.uint64()),
                "qchars": pa.array(o_qchars, pa.int32()),
            }
        )

    candidates = map_key_runs(exploded, "anchor", emit_candidates, num_partitions)

    # ---- verify: key candidates by container id, union the docs table
    def tag_docs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column(id_col),
                "qid": pa.array([None] * n, id_type),
                "start": pa.array(np.full(n, -1, np.int32)),
                "qlen": pa.array(np.zeros(n, np.int32)),
                "qhash": pa.array(np.zeros(n, np.uint64)),
                "qchars": pa.array(np.zeros(n, np.int32)),
                "text": batch.column(text_col),
            }
        )

    def pad_candidates(batch: pa.Table) -> pa.Table:
        return batch.append_column("text", pa.array([None] * len(batch), pa.string()))

    verify_input = ds.select_columns([id_col, text_col]).map_batches(
        tag_docs, batch_format="pyarrow"
    ).union(candidates.map_batches(pad_candidates, batch_format="pyarrow"))

    def verify(block: pa.Table, starts, ends) -> pa.Table:
        from raydedup.suffix import poly_powers as _pp

        texts = block.column("text").to_pylist()
        keys = block.column("key").to_numpy(zero_copy_only=False)
        # qid is nullable (None on doc rows): to_numpy would degrade
        # int64 to float64/NaN — go through pylist
        qids = block.column("qid").to_pylist()
        start = block.column("start").to_numpy(zero_copy_only=False)
        qlen = block.column("qlen").to_numpy(zero_copy_only=False)
        qh = block.column("qhash").to_numpy(zero_copy_only=False)
        qchars = block.column("qchars").to_numpy(zero_copy_only=False)
        memo: dict = {}
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            doc_idx = next((k for k in range(s, e) if texts[k] is not None), None)
            if doc_idx is None or e - s < 2:
                continue
            text = texts[doc_idx]
            toks = (text or "").split()
            L = len(toks)
            hv = token_hashes64(toks, memo)
            bpow, binv = poly_powers(L)
            S = poly_prefix_sums(hv, binv)
            cid = keys[s]
            cchars = len(text)
            idx = np.array([k for k in range(s, e) if k != doc_idx], dtype=np.int64)
            st = start[idx].astype(np.int64)
            ql = qlen[idx].astype(np.int64)
            fin = st + ql
            valid = (fin <= L) & (qchars[idx] < cchars)
            if not valid.any():
                continue
            vi = idx[valid]
            # H(st, fin) normalized to the query frame: exponent of the
            # m-th window token must be ql-1-m ⇒ multiplier B^(fin-1)
            h = (S[fin[valid]] - S[st[valid]]) * bpow[fin[valid] - 1]
            match = h == qh[vi]
            seen = set()  # multiple matching starts → one pair
            for k in vi[match]:
                q = qids[k]
                if q not in seen:
                    seen.add(q)
                    out_a.append(q)
                    out_b.append(cid)
        return pa.table({"id_a": pa.array(out_a, id_type), "id_b": pa.array(out_b, id_type)})

    pairs = map_key_runs(verify_input, "key", verify, num_partitions)

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

    # pairs are globally unique by construction: each (query-class,
    # container) is generated in exactly one anchor run, deduped per
    # container run in verify; short-path pairs are disjoint (query has
    # < window tokens). No dedupe shuffle needed.
    return pairs


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
