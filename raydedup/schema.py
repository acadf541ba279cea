"""Arrow schemas + storage format shim (Lance target, Parquet fallback).

The north rule's input is a Lance table of image+caption pairs with the
exact columns below (BASELINE.json ``input_hint``). The ``lance``
package is absent in this sandbox, so the shim writes/reads
identical-schema Parquet; the Lance codepath is kept behind an import
guard and activates transparently where lance is installed.
"""

from __future__ import annotations

import pyarrow as pa

try:  # pragma: no cover - lance absent in sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# Stored/shuffled as uint32: MinHash slot values are < 2^32 by the
# reference's _max_hash contract, so the persisted column (and every
# band/verify shuffle and checkpoint it feeds) ships HALF the bytes of
# the uint64 kernels. sig_to_numpy upcasts, so all kernel math stays
# uint64 (VERDICT r03 next-#9).
SIGNATURE_FIELD = ("minhash", pa.list_(pa.uint32(), 128))


def write_table(table: pa.Table, path: str) -> str:
    """Write one Arrow table to ``path`` (.lance dataset dir when lance is
    available, else a .parquet file). Returns the path actually written."""
    if HAVE_LANCE:
        lance.write_dataset(table, path if path.endswith(".lance") else path + ".lance")
        return path + ".lance" if not path.endswith(".lance") else path
    import pyarrow.parquet as pq

    p = path if path.endswith(".parquet") else path + ".parquet"
    pq.write_table(table, p)
    return p


def read_dataset(path: str, columns: list[str] | None = None):
    """Read a table as a ``ray.data.Dataset`` with column pruning at the
    read (SURVEY.md: prune at the read — never load `bytes` for a
    caption-only stage)."""
    import ray.data as rd

    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def sig_to_numpy(col: pa.ChunkedArray | pa.Array, num_perm: int = 128):
    """(N, P) uint64 view of a fixed_size_list<uint32|uint64, P> column
    — zero-copy for uint64 input, one upcast for the (default) uint32
    storage so every kernel keeps uint64 math."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    arr = np.asarray(flat.to_numpy(zero_copy_only=False)).reshape(-1, num_perm)
    return arr if arr.dtype == np.uint64 else arr.astype(np.uint64)


def numpy_to_sig(arr, num_perm: int = 128) -> pa.Array:
    """Pack an (N, P) signature matrix into the storage column
    (fixed_size_list<uint32, P> — values are < 2^32 by _max_hash)."""
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(arr.reshape(-1).astype(np.uint32)), num_perm
    )
