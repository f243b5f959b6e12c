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
- **crash-safe**: each directory is rewritten through the same
  tmp-dir → ``os.replace`` rename as ``atomic_write_parquet`` — a kill
  mid-compaction leaves either the old or the new layout, never a mix.
- **idempotent**: directories already at ≤1 file or whose every file
  meets the size floor are skipped, so a re-run is a no-op.
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


def _compact_dir(part_dir: str, target_bytes: int) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    sizes = [os.path.getsize(f) for f in files]
    report = {"dir": part_dir, "files_before": len(files),
              "files_after": len(files),
              "bytes": int(sum(sizes)), "compacted": False}
    if len(files) <= 1 or all(s >= target_bytes for s in sizes):
        return report
    parent = os.path.dirname(part_dir.rstrip("/"))
    tmp = tempfile.mkdtemp(dir=parent, prefix=".tmp-compact-")
    try:
        keep = [f for f in os.listdir(part_dir)
                if not f.endswith(".parquet")]
        for extra in keep:  # sidecar files (manifests) ride along
            shutil.copy2(os.path.join(part_dir, extra),
                         os.path.join(tmp, extra))
        # stream file-by-file: buffer tables until the on-disk sizes
        # reach the target, then flush one output file — peak memory
        # is one output group + one input file, never the whole dir
        n_written = 0
        buf: list = []
        buf_bytes = 0

        def flush():
            nonlocal n_written, buf, buf_bytes
            if not buf:
                return
            pq.write_table(
                pa.concat_tables(buf),
                os.path.join(tmp, f"part-{n_written:05d}.parquet"))
            n_written += 1
            buf, buf_bytes = [], 0

        for f, sz in zip(files, sizes):
            buf.append(pq.read_table(f))
            buf_bytes += sz
            if buf_bytes >= target_bytes:
                flush()
        flush()
        old = part_dir.rstrip("/") + ".old"
        os.replace(part_dir, old)
        os.replace(tmp, part_dir)
        shutil.rmtree(old)
        report["files_after"] = n_written
        report["compacted"] = True
        return report
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


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
