"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in cesium_ray library code.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (SURVEY.md §3) on /root/testdata/sf0.001:
    events adapted to the transcript shape → normalize → one conv-keyed
    hash shuffle → rollup 1m/1h/1d + gap-fill + Gorilla/DoD chunks +
    cesium general features, with per-partition manifests.  Returns the
    per-partition metrics (lineage) table."""
    import ray.data

    from cesium_ray.pipelines import run_flagship
    from cesium_ray.sources import events_as_turns

    turns = events_as_turns("/root/testdata/sf0.001")
    out_root = tempfile.mkdtemp(prefix="cesium-ray-flagship-")
    metrics = run_flagship(
        turns, out_root, num_partitions=8, features="general", resume=False
    )
    return metrics


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from cesium_ray.pipelines.driver_queries import QUERIES
    from cesium_ray.pipelines.extra_queries import EXTRA_QUERIES

    return {**QUERIES, **EXTRA_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query; genuinely non-SQL
    ops (LS periodicity, seeded minhash/simhash, seeded sampling) are
    rows-only."""
    from cesium_ray.pipelines.driver_queries import ORACLE_SQL
    from cesium_ray.pipelines.extra_queries import EXTRA_ORACLE_SQL

    return {**ORACLE_SQL, **EXTRA_ORACLE_SQL}
