"""Zonemap file pruning (state/zonemap.py) on top of the Z-order
layout (stages/partition.py::zorder_sort): a 2-D (key x time) box
predicate must read fewer files from the z-ordered layout than from a
1-D time-sorted layout, with bit-identical query results."""

import numpy as np
import pandas as pd
import pytest
import ray.data

_DAY_US = 86_400_000_000


def _events(n=40000, nusers=64, days=6, seed=909):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, nusers, n),
        "ts": pd.to_datetime(
            rng.integers(0, days * 86400, n) * 10**6, unit="us"
        ).astype("datetime64[us]"),
        "value": np.round(rng.uniform(0, 10, n), 2),
    })


@pytest.fixture(scope="module")
def layouts(ray_session, tmp_path_factory):
    from cesium_ray.stages.partition import zorder_sort

    ev = _events()
    root = tmp_path_factory.mktemp("zonemap")
    zdir, tdir = str(root / "zorder"), str(root / "tsorted")
    ds = ray.data.from_pandas(ev).repartition(32)
    zorder_sort(ds, bits=8).write_parquet(zdir)
    ds.sort("ts").write_parquet(tdir)
    return ev, zdir, tdir


def test_pruned_read_correct_and_tighter(layouts):
    from cesium_ray.state.zonemap import pruned_read

    ev, zdir, tdir = layouts
    box = {"user_id": (0, 15), "ts": (0, 2 * _DAY_US - 1)}

    def run(path):
        ds, rep = pruned_read(path, box)
        assert ds is not None
        df = ds.to_pandas()
        tus = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        m = ((df["user_id"] >= 0) & (df["user_id"] <= 15)
             & (tus >= box["ts"][0]) & (tus <= box["ts"][1]))
        return df[m].sort_values("event_id").reset_index(drop=True), rep

    zdf, zrep = run(zdir)
    tdf, trep = run(tdir)
    want = ev[(ev["user_id"] <= 15)
              & (ev["ts"].to_numpy("datetime64[us]").view(np.int64)
                 < 2 * _DAY_US)].sort_values("event_id")
    # identical results from both layouts, equal to the full-scan truth
    assert len(zdf) == len(tdf) == len(want)
    assert (zdf["event_id"].to_numpy()
            == want["event_id"].to_numpy()).all()
    # the 2-D layout must skip files the 1-D layout cannot
    assert zrep["files_total"] >= 16
    assert zrep["files_read"] < zrep["files_total"]
    assert zrep["files_read"] < trep["files_read"], (zrep, trep)


def test_prune_never_drops_matching_rows(layouts):
    """Conservative pruning: every box, including misaligned ones,
    returns exactly the full-scan rows."""
    from cesium_ray.state.zonemap import pruned_read

    ev, zdir, _ = layouts
    tus_all = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    for ulo, uhi, dlo, dhi in [(3, 21, 1, 3), (50, 63, 0, 5),
                               (7, 7, 2, 2)]:
        box = {"user_id": (ulo, uhi),
               "ts": (dlo * _DAY_US, (dhi + 1) * _DAY_US - 1)}
        ds, rep = pruned_read(zdir, box)
        want = ((ev["user_id"] >= ulo) & (ev["user_id"] <= uhi)
                & (tus_all >= box["ts"][0])
                & (tus_all <= box["ts"][1])).sum()
        if ds is None:
            assert want == 0
            continue
        df = ds.to_pandas()
        tus = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        got = ((df["user_id"] >= ulo) & (df["user_id"] <= uhi)
               & (tus >= box["ts"][0]) & (tus <= box["ts"][1])).sum()
        assert got == want, (ulo, uhi, dlo, dhi, rep)
