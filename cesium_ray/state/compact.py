"""Small-file compaction for the tiered rollup store (the maintenance
companion to ``retention_sweep`` — continuous-aggregate stores
accumulate one part file per exchange partition per run, and at
10¹²-turn scale a date partition ends up with hundreds of KB-sized
files that wreck read fan-out).

``compact_partitions`` rewrites each ``tier=<t>/date=<d>`` directory
whose part files are smaller than the target into the fewest files of
≈``target_bytes`` each.  Properties:

- **bit-preserving**: rows are concatenated in sorted-filename order;
  a before/after read returns identical frames (tests assert exact
  equality after a stable sort).
- **crash-safe**: the new layout is staged in a tmp dir and swapped
  in by rename; the displaced dir carries a DOT-prefixed name no
  ``date=*`` glob can see, and ``_recover_dir`` (run at the start of
  every ``compact_partitions``) heals the two inter-rename crash
  windows — a missing live dir is restored from its ``.old``, a
  surviving ``.old`` beside a live dir is deleted.  Readers never see
  duplicated or missing rows.
- **idempotent**: a directory is rewritten only when the greedy size
  plan would REDUCE its file count — an already-compacted layout
  (including a sub-target tail file) plans one group per file and is
  skipped, so a re-run is a no-op.
- **parallel**: one Ray task per directory (filesystem maintenance is
  the documented raw-task exception to the Dataset-first rule — there
  is no record stream to express).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pandas as pd
import ray


def _plan_groups(sizes: list, target_bytes: int) -> list:
    """Greedy grouping: accumulate files until the running size
    reaches the target, then cut.  Returns per-file group ids."""
    gids, gid, acc = [], 0, 0
    for s in sizes:
        gids.append(gid)
        acc += s
        if acc >= target_bytes:
            gid += 1
            acc = 0
    return gids


def _compact_dir(part_dir: str, target_bytes: int) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    sizes = [os.path.getsize(f) for f in files]
    report = {"dir": part_dir, "files_before": len(files),
              "files_after": len(files),
              "bytes": int(sum(sizes)), "compacted": False}
    gids = _plan_groups(sizes, target_bytes)
    n_groups = (gids[-1] + 1) if gids else 0
    # idempotence: skip when merging would not reduce the file count
    # (re-running on an already-compacted layout plans one group per
    # existing file — a sub-target tail file alone is NOT a reason to
    # rewrite the whole directory)
    if len(files) <= 1 or n_groups == len(files):
        return report
    parent = os.path.dirname(part_dir.rstrip("/"))
    base = os.path.basename(part_dir.rstrip("/"))
    tmp = tempfile.mkdtemp(dir=parent, prefix=".tmp-compact-")
    try:
        keep = [f for f in os.listdir(part_dir)
                if not f.endswith(".parquet")]
        for extra in keep:  # sidecar files (manifests) ride along
            shutil.copy2(os.path.join(part_dir, extra),
                         os.path.join(tmp, extra))
        # stream group-by-group: peak memory is one output group plus
        # one input file, never the whole directory
        n_written = 0
        buf: list = []

        def flush():
            nonlocal n_written, buf
            if not buf:
                return
            pq.write_table(
                pa.concat_tables(buf),
                os.path.join(tmp, f"part-{n_written:05d}.parquet"))
            n_written += 1
            buf = []

        for i, f in enumerate(files):
            if i and gids[i] != gids[i - 1]:
                flush()
            buf.append(pq.read_table(f))
        flush()
        # swap: the displaced dir gets a DOT-prefixed name so no
        # date=*/part-* glob can ever see it; _recover_dir() below
        # heals the two crash windows on the next compaction run
        old = os.path.join(parent, "." + base + ".old")
        shutil.rmtree(old, ignore_errors=True)
        os.replace(part_dir, old)
        os.replace(tmp, part_dir)
        shutil.rmtree(old)
        report["files_after"] = n_written
        report["compacted"] = True
        return report
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _recover_dir(parent: str) -> None:
    """Heal crash debris from a previous compaction: a leftover
    ``.<date=d>.old`` whose live dir is MISSING is renamed back (the
    crash hit between the two renames); one whose live dir exists is
    deleted (the crash hit before the final cleanup).  Orphan
    ``.tmp-compact-*`` dirs are removed."""
    for d in os.listdir(parent):
        p = os.path.join(parent, d)
        if d.startswith(".tmp-compact-"):
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith(".") and d.endswith(".old"):
            live = os.path.join(parent, d[1:-4])
            if os.path.exists(live):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.replace(p, live)


_compact_dir_task = ray.remote(num_cpus=1)(_compact_dir)


def compact_partitions(
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    tiers: tuple | None = None,
    parallel: bool = True,
) -> pd.DataFrame:
    """Compact every ``tier=*/date=*`` partition under ``root`` to
    ≈``target_bytes`` files.  Returns a per-directory report frame."""
    dirs = []
    for tier_dir in sorted(glob.glob(os.path.join(root, "tier=*"))):
        tier = os.path.basename(tier_dir)[5:]
        if tiers is not None and tier not in tiers:
            continue
        _recover_dir(tier_dir)  # heal any crash debris first
        dirs.extend(sorted(glob.glob(os.path.join(tier_dir, "date=*"))))
    if not dirs:
        return pd.DataFrame({"dir": pd.Series(dtype=object),
                             "files_before": pd.Series(dtype="int64"),
                             "files_after": pd.Series(dtype="int64"),
                             "bytes": pd.Series(dtype="int64"),
                             "compacted": pd.Series(dtype=bool)})
    if parallel:
        reports = ray.get([_compact_dir_task.remote(d, target_bytes)
                           for d in dirs])
    else:
        reports = [_compact_dir(d, target_bytes) for d in dirs]
    return pd.DataFrame(reports)
