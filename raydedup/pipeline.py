"""The flagship near-dup detection + clustering pipeline.

read(images table) → SignatureStage (actor pool: MinHash over caption
shingles + SimHash from phash) → band explode (MinHash b×r bands ∪
SimHash bit-bands) → bucket groupby shuffle → candidate pairs (+ exact
content-hash stars + suffix-array substring pairs) → optional Jaccard
verification → connected components → (image_id, cluster_id).

Per-stage checkpointing: every materialized stage can persist to a
named Parquet directory with a manifest (row count, wall time, config
fingerprint); a resumed run reuses any stage whose manifest is present
and config-compatible — "resumable from checkpoint mid-shuffle" means
the expensive signature and pair tables are never recomputed
(SURVEY.md §4.2/§4.3). The manifest doubles as per-stage lineage +
metrics output.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict

import pyarrow as pa

from raydedup.params import optimal_param
from raydedup.stages.bands import (
    candidate_pairs,
    explode_minhash_bands,
    explode_simhash_bands,
    simhash_candidate_pairs,
)
from raydedup.stages.components import connected_components
from raydedup.stages.dedup import exact_dup_pairs, substring_pairs
from raydedup.stages.signatures import SignatureStage
from raydedup.stages.verify import verify_pairs


@dataclass
class DedupConfig:
    num_perm: int = 128
    seed: int = 1
    threshold: float = 0.8
    shingle: str = "word3"
    use_simhash: bool = True
    simhash_bands: int = 4  # catches Hamming ≤ 3 on the 64-bit phash
    use_substring: bool = True
    substring_window: int = 4
    use_exact: bool = True
    verify_jaccard: bool = False  # reference candidates are unfiltered (lsh.py:376-378)
    bucket_cap: int = 512
    id_col: str = "image_id"
    text_col: str = "caption"
    phash_col: str | None = "phash"
    signature_batch_size: int = 1024
    signature_concurrency: int = 8
    num_partitions: int = 16
    checkpoint_dir: str | None = None

    @property
    def band_params(self) -> tuple[int, int]:
        return optimal_param(self.threshold, self.num_perm)

    def fingerprint(self) -> str:
        d = asdict(self)
        d.pop("checkpoint_dir", None)
        d.pop("signature_concurrency", None)
        d.pop("num_partitions", None)
        return json.dumps(d, sort_keys=True)


class Checkpointer:
    """Stage-output persistence + lineage manifest."""

    def __init__(self, root: str | None, config_fingerprint: str):
        self.root = root
        self.fp = config_fingerprint
        self.metrics: list[dict] = []
        if root:
            os.makedirs(root, exist_ok=True)

    def run(self, name: str, build):
        """Return a Dataset for stage ``name``: reuse the checkpoint if
        its manifest matches the config, else build, persist, record."""
        import ray.data as rd

        if self.root:
            stage_dir = os.path.join(self.root, name)
            manifest = os.path.join(self.root, f"{name}.manifest.json")
            if os.path.exists(manifest) and os.path.isdir(stage_dir):
                with open(manifest) as f:
                    meta = json.load(f)
                if meta.get("config_fingerprint") == self.fp:
                    self.metrics.append({"stage": name, "reused": True, **meta})
                    return rd.read_parquet(stage_dir)
        t0 = time.perf_counter()
        ds = build()
        if not self.root:
            # no checkpoint dir: pin the stage output in the object store
            # (timed) so downstream consumers never re-run the build
            ds = ds.materialize()
        if self.root:
            stage_dir = os.path.join(self.root, name)
            tmp = stage_dir + ".tmp"
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            ds.write_parquet(tmp)
            n = rd.read_parquet(tmp).count()
            shutil.rmtree(stage_dir, ignore_errors=True)
            os.rename(tmp, stage_dir)
            meta = {
                "rows": n,
                "wall_sec": round(time.perf_counter() - t0, 3),
                "config_fingerprint": self.fp,
            }
            with open(os.path.join(self.root, f"{name}.manifest.json"), "w") as f:
                json.dump(meta, f)
            self.metrics.append({"stage": name, "reused": False, **meta})
            return rd.read_parquet(stage_dir)
        self.metrics.append(
            {"stage": name, "reused": False, "wall_sec": round(time.perf_counter() - t0, 3)}
        )
        return ds

    def flush_metrics(self):
        if self.root:
            with open(os.path.join(self.root, "metrics.json"), "w") as f:
                json.dump(self.metrics, f, indent=1)


def dedup_pipeline(ds, config: DedupConfig | None = None) -> dict:
    """Run the flagship pipeline; returns dict with ``signatures``,
    ``pairs``, ``clusters`` Datasets (clusters may be an Arrow table when
    the driver DSU path is taken) and ``metrics``."""
    cfg = config or DedupConfig()
    from raydedup.stages.grouped import ensure_hash_shuffle

    ensure_hash_shuffle()
    b, r = cfg.band_params
    ck = Checkpointer(cfg.checkpoint_dir, cfg.fingerprint())

    def build_signatures():
        return ds.map_batches(
            SignatureStage,
            fn_constructor_kwargs=dict(
                num_perm=cfg.num_perm,
                seed=cfg.seed,
                shingle=cfg.shingle,
                text_col=cfg.text_col,
                phash_col=cfg.phash_col if cfg.use_simhash else None,
            ),
            batch_format="pyarrow",
            batch_size=cfg.signature_batch_size,
            # autoscaling pool: never reserves every CPU up front, so the
            # feeding read/map tasks can't be starved into a deadlock
            concurrency=(1, cfg.signature_concurrency),
            num_cpus=1,
        )

    # The signature table is consumed by several downstream branches
    # (minhash bands, simhash bands, exact/substring, verification); the
    # checkpoint (or in-memory materialize) pins it so the lazy plan is
    # never duplicated per branch.
    signatures = ck.run("signatures", build_signatures)

    # Each candidate source runs as its own (checkpointable) execution:
    # one or two shuffle operators at a time keeps the aggregator-actor
    # footprint bounded on small sessions, serializes peak shuffle
    # memory at scale, and gives per-branch resume points. All branches
    # read the materialized signature table (it keeps id/caption/phash)
    # — never the raw input lineage, which would re-execute the read per
    # branch and can wedge the streaming scheduler behind a blocking
    # repartition.
    branches = {}

    def build_minhash_pairs():
        bands = signatures.map_batches(
            lambda t: explode_minhash_bands(t, b, r, cfg.id_col, cfg.num_perm),
            batch_format="pyarrow",
        )
        return candidate_pairs(
            bands, cfg.id_col, bucket_cap=cfg.bucket_cap, num_partitions=cfg.num_partitions
        )

    branches["pairs_minhash"] = build_minhash_pairs

    if cfg.use_simhash and cfg.phash_col:

        def build_simhash_pairs():
            sim_bands = signatures.map_batches(
                lambda t: explode_simhash_bands(t, cfg.simhash_bands, cfg.id_col),
                batch_format="pyarrow",
            )
            # simhash pairs are Hamming-verified inside the bucket —
            # unverified 16-bit band collisions flood components at scale
            return simhash_candidate_pairs(
                sim_bands,
                cfg.id_col,
                max_hamming=cfg.simhash_bands - 1,
                num_partitions=cfg.num_partitions,
            )

        branches["pairs_simhash"] = build_simhash_pairs

    if cfg.use_exact:
        branches["pairs_exact"] = lambda: exact_dup_pairs(
            signatures,
            [cfg.text_col, cfg.phash_col] if cfg.phash_col else [cfg.text_col],
            cfg.id_col,
        )
    if cfg.use_substring:
        branches["pairs_substring"] = lambda: substring_pairs(
            signatures,
            cfg.id_col,
            cfg.text_col,
            window=cfg.substring_window,
            num_partitions=cfg.num_partitions,
        )

    pair_sets = [ck.run(name, build) for name, build in branches.items()]

    def build_pairs():
        pairs = pair_sets[0]
        for e in pair_sets[1:]:
            pairs = pairs.union(e)
        if len(pair_sets) > 1:
            from raydedup.stages.grouped import unique_rows_partitioned

            pairs = unique_rows_partitioned(pairs, ["id_a", "id_b"], cfg.num_partitions)
        if cfg.verify_jaccard:
            pairs = verify_pairs(
                pairs, signatures, cfg.id_col, cfg.threshold, cfg.num_perm, cfg.num_partitions
            ).select_columns(["id_a", "id_b"])
        return pairs

    # the pair table is tiny relative to the corpus (near-dup edges only);
    # ck.run pins it so components' count + iterate don't re-run the shuffle
    pairs = ck.run("pairs", build_pairs)

    t0 = time.perf_counter()
    clusters = connected_components(pairs, num_partitions=cfg.num_partitions)
    ck.metrics.append({"stage": "components", "wall_sec": round(time.perf_counter() - t0, 3)})
    ck.flush_metrics()
    return {"signatures": signatures, "pairs": pairs, "clusters": clusters, "metrics": ck.metrics}
