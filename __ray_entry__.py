"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in raydedup) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship near-dup clustering pipeline over the sf0.001
  documents table (text profile of the image+caption pipeline — the
  full multimodal path runs in tests/bench over the synthetic F1 table).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (SURVEY.md §2 + training-data ops); SQL-expressible ops carry a DuckDB
  oracle with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from raydedup.queries import q_minhash_dedup_docs

    return q_minhash_dedup_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raydedup.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raydedup.queries import ORACLES

    return dict(ORACLES)
