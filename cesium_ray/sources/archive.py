"""Archive extraction S3 (SURVEY.md §2.1) — semantics of
``cesium/util.py::extract_time_series``: a context manager that
unpacks a .tar[.gz/.bz2] or .zip of delimited series files into a
temp directory, yields the extracted member paths (sorted, data files
only), and cleans up on exit.  ``featurize_archive`` composes it with
the E2 file-batch featurizer so the one cesium workflow a migrating
user runs on archives works unchanged.

Safety: members with absolute paths or ``..`` traversal are rejected
(the reference trusts its inputs; a from-scratch engine should not).
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tarfile
import tempfile
import zipfile


def _safe_members(names, dest):
    out = []
    for n in names:
        if not n or n.endswith("/"):
            continue
        p = os.path.normpath(n)
        if p.startswith("..") or os.path.isabs(p):
            raise ValueError(f"unsafe archive member path: {n!r}")
        out.append(p)
    return sorted(out)


@contextlib.contextmanager
def extract_time_series(archive_path: str):
    """Yield the list of extracted file paths for one archive
    (cesium/util.py::extract_time_series semantics).  A plain data
    file (not an archive) yields itself, matching the reference's
    pass-through behavior."""
    if not (
        tarfile.is_tarfile(archive_path) or zipfile.is_zipfile(archive_path)
    ):
        yield [archive_path]
        return
    tmp = tempfile.mkdtemp(prefix="cesium-ray-archive-")
    try:
        if tarfile.is_tarfile(archive_path):
            with tarfile.open(archive_path) as tf:
                names = _safe_members(tf.getnames(), tmp)
                tf.extractall(tmp, filter="data")
        else:
            with zipfile.ZipFile(archive_path) as zf:
                names = _safe_members(zf.namelist(), tmp)
                zf.extractall(tmp)
        paths = [
            os.path.join(tmp, n) for n in names
            if os.path.isfile(os.path.join(tmp, n))
        ]
        yield paths
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def featurize_archive(
    archive_path: str,
    features_to_use=None,
    header_df=None,
    sep: str = ",",
    **kw,
):
    """E2-on-archives: extract → ``featurize_ts_files`` (one Ray batch
    job over all members)."""
    from ..pipelines.featurize import featurize_ts_files

    with extract_time_series(archive_path) as paths:
        return featurize_ts_files(
            paths, features_to_use=features_to_use, header_df=header_df,
            sep=sep, **kw,
        )
