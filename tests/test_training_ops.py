"""Ground-truth conformance for the round-5 training-data operators
(``dup_ngram_fraction``, ``cross_source_neardup``,
``stratified_sample_docs``) — brute-force Python oracles over the
sf0.001 corpus, complementing the DuckDB driver oracles."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_dup_ngram_fraction_bruteforce(ray_session):
    """Exact per-doc (dup, total) distinct-5-gram counts vs a pure
    Python set oracle — pins the flat window-hash + per-row dedupe +
    two-shuffle fold end-to-end (str.split() matches the \\s+ profile
    the token_counts oracle pins)."""
    from raydedup.queries import QUERIES

    got = QUERIES["dup_ngram_fraction"](SF).to_pandas()
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    grams = {}
    for did, txt in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        w = txt.lower().split()
        grams[did] = {tuple(w[i : i + 5]) for i in range(len(w) - 4)}
    from collections import Counter

    df = Counter(g for s in grams.values() for g in s)
    want = {
        did: (sum(1 for g in s if df[g] >= 2), len(s)) for did, s in grams.items()
    }
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert (row.dup_ngrams, row.total_ngrams) == want[row.doc_id], row.doc_id


def test_cross_source_neardup_consistency(ray_session):
    """The cross-source pair set must equal the full banded candidate
    set filtered to source-mismatched endpoints — two independent
    emit kernels (in-bucket hash filter vs post-hoc join) agreeing."""
    from raydedup.queries import QUERIES

    cross = QUERIES["cross_source_neardup"](SF).to_pandas()
    allp = QUERIES["lsh_candidate_pairs_docs"](SF).to_pandas()
    src = dict(
        zip(
            *(
                pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
                .column(c)
                .to_pylist()
                for c in ("doc_id", "source")
            )
        )
    )
    want = {
        (a, b)
        for a, b in zip(allp["id_a"], allp["id_b"])
        if src[a] != src[b]
    }
    got = set(zip(cross["id_a"], cross["id_b"]))
    assert got == want and len(got) > 0


def test_stratified_sample_exact_and_deterministic(ray_session):
    """The keep set is a pure function of (doc_id, source): replicate
    the wrap-multiply + Mersenne reduction in numpy and demand the
    exact id set, twice (reproducibility is the operator's point)."""
    from raydedup.hashing import MERSENNE_PRIME
    from raydedup.queries import QUERIES

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    x = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.uint64)
    v = np.uint64(6364136223846793005) * x + np.uint64(1442695040888963407)
    hi = v >> np.uint64(61)
    v = (v & MERSENNE_PRIME) + hi
    v[v >= MERSENNE_PRIME] -= MERSENNE_PRIME
    slot = (v % np.uint64(100)).astype(np.int64)
    rate = np.array(
        [10 + 7 * (int(s[3:]) % 8) for s in tbl.column("source").to_pylist()],
        dtype=np.int64,
    )
    want = {d for d, keep in zip(tbl.column("doc_id").to_pylist(), slot < rate) if keep}

    got1 = set(QUERIES["stratified_sample_docs"](SF).to_pandas()["doc_id"])
    got2 = set(QUERIES["stratified_sample_docs"](SF).to_pandas()["doc_id"])
    assert got1 == want and got2 == want and 0 < len(want) < len(x)


def test_source_mix_epochs_exact(ray_session):
    """Repeat factors, epoch numbering and interleave keys all exact vs
    a pure Python expansion; re-run identical (reproducibility is the
    operator's point)."""
    from raydedup.hashing import MERSENNE_PRIME
    from raydedup.queries import QUERIES

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])

    def key(d, e):
        v = (6364136223846793005 * (d * 8 + e) + 1442695040888963407) % (1 << 64)
        v = (v & int(MERSENNE_PRIME)) + (v >> 61)
        return v - int(MERSENNE_PRIME) if v >= int(MERSENNE_PRIME) else v

    want = {
        (d, e, key(d, e))
        for d, s in zip(tbl.column("doc_id").to_pylist(), tbl.column("source").to_pylist())
        for e in range(1 + int(s[3:]) % 4)
    }
    got1 = QUERIES["source_mix_epochs"](SF).to_pandas()
    got2 = QUERIES["source_mix_epochs"](SF).to_pandas()
    g1 = set(zip(got1["doc_id"], got1["epoch"], got1["interleave_key"]))
    g2 = set(zip(got2["doc_id"], got2["epoch"], got2["interleave_key"]))
    assert g1 == want == g2 and len(got1) == len(want) > len(tbl)
