"""cesium-compatible API tests (SURVEY.md §5.1 — semantics of
cesium/tests/test_featurize.py / test_time_series.py /
test_data_management.py)."""

import numpy as np
import pandas as pd
import pytest

from cesium_ray.pipelines import (
    featurize_time_series,
    featurize_ts_files,
    load_featureset,
    save_featureset,
)
from cesium_ray.sources import (
    DEFAULT_ERROR_VALUE,
    DEFAULT_MAX_TIME,
    normalize_series,
    parse_headerfile,
    parse_ts_data,
)
from cesium_ray.stages import impute_featureset


def test_single_series_shapes():
    t = np.linspace(0, 10, 50)
    m = np.sin(t)
    out = featurize_time_series(times=t, values=m, features_to_use=["mean", "amplitude"])
    assert len(out) == 1
    assert set(["series_id", "channel", "mean", "amplitude"]) <= set(out.columns)
    assert out["amplitude"].iloc[0] == pytest.approx((m.max() - m.min()) / 2)


def test_defaulting_no_time_no_error():
    # cesium: missing t → linspace(0, DEFAULT_MAX_TIME, n); missing e → const
    m = np.array([1.0, 2.0, 3.0, 4.0])
    out = featurize_time_series(values=m, features_to_use=["total_time", "avg_err", "mean"])
    assert out["total_time"].iloc[0] == pytest.approx(DEFAULT_MAX_TIME)
    assert out["avg_err"].iloc[0] == pytest.approx(DEFAULT_ERROR_VALUE)


def test_multichannel_ragged():
    t = np.linspace(0, 1, 20)
    out = featurize_time_series(
        times=[t], values=[[np.ones(20), np.arange(10.0)]],
        features_to_use=["n_epochs", "mean"],
    )
    assert len(out) == 2  # two channels
    assert list(out["channel"]) == [0, 1]
    assert out["n_epochs"].tolist() == [20.0, 10.0]


def test_labels_and_meta_passthrough():
    out = featurize_time_series(
        times=[None, None],
        values=[np.arange(5.0), np.arange(6.0)],
        labels=["classA", "classB"],
        meta_features=[{"meta1": 0.5}, {"meta1": 0.7}],
        names=["s1", "s2"],
        features_to_use=["mean"],
    )
    assert list(out["label"]) == ["classA", "classB"]
    assert list(out["meta1"]) == [0.5, 0.7]


def test_sort_applied():
    # unsorted time must be sorted before features (M2)
    t = np.array([3.0, 1.0, 2.0, 0.0])
    m = np.array([30.0, 10.0, 20.0, 0.0])
    out = featurize_time_series(times=t, values=m, features_to_use=["max_slope"])
    assert out["max_slope"].iloc[0] == pytest.approx(10.0)


def test_parse_ts_data_columns(tmp_path):
    p1 = tmp_path / "a.dat"
    p1.write_text("0.0,1.0,0.1\n1.0,2.0,0.1\n")
    arr = parse_ts_data(str(p1))
    assert arr.shape == (2, 3)
    p2 = tmp_path / "b.dat"
    p2.write_text("1.0\n2.0\n3.0\n")
    arr2 = parse_ts_data(str(p2))
    assert arr2.shape[0] == 3
    # 4-column file → first 3 kept
    p3 = tmp_path / "c.dat"
    p3.write_text("0,1,0.1,9\n1,2,0.1,9\n")
    assert parse_ts_data(str(p3)).shape == (2, 3)


def test_featurize_ts_files_with_header(tmp_path):
    for name, vals in [("s1", [1.0, 2.0, 3.0]), ("s2", [5.0, 5.0, 8.0])]:
        (tmp_path / f"{name}.dat").write_text(
            "\n".join(f"{i},{v},0.1" for i, v in enumerate(vals))
        )
    hdr = tmp_path / "header.csv"
    hdr.write_text("filename,label,meta1\ns1,x,1.5\ns2,y,2.5\n")
    out = featurize_ts_files(
        [str(tmp_path / "s1.dat"), str(tmp_path / "s2.dat")],
        features_to_use=["mean", "amplitude"],
        header_df=parse_headerfile(str(hdr)),
    )
    assert list(out["label"]) == ["x", "y"]
    assert list(out["meta1"]) == [1.5, 2.5]
    assert out["mean"].tolist() == [2.0, 6.0]


def test_save_load_featureset_roundtrip(tmp_path):
    out = featurize_time_series(values=np.arange(10.0), features_to_use=["mean", "std"])
    path = str(tmp_path / "fset.parquet")
    save_featureset(out, path)
    back = load_featureset(path)
    pd.testing.assert_frame_equal(out, back)


def test_normalize_series_broadcast_scalar_error():
    t, m, e = normalize_series([0, 1, 2], [1.0, 2.0, 3.0], 0.5)
    np.testing.assert_allclose(e, [0.5, 0.5, 0.5])


def test_impute_featureset_constant_and_mean():
    import ray.data

    df = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "channel": ["x", "x", "x"],
            "f1": [1.0, np.nan, 3.0],
            "f2": [np.inf, 2.0, 4.0],
        }
    )
    const = impute_featureset(ray.data.from_pandas(df), "constant", value=-1.0).to_pandas()
    assert const["f1"].tolist() == [1.0, -1.0, 3.0]
    assert const["f2"].tolist() == [-1.0, 2.0, 4.0]  # inf clipped → filled
    mean = impute_featureset(ray.data.from_pandas(df), "mean").to_pandas()
    assert mean["f1"].tolist() == [1.0, 2.0, 3.0]
    assert mean["f2"].tolist() == [3.0, 2.0, 4.0]


def test_to_cesium_frame_multiindex():
    """cesium featureset layout: MultiIndex (feature, channel) columns,
    one row per series (assemble_featureset parity)."""
    from cesium_ray.pipelines.featurize import to_cesium_frame

    out = featurize_time_series(
        times=[None, None],
        values=[[np.arange(5.0), np.arange(10.0)], np.arange(6.0)],
        names=["a", "b"],
        features_to_use=["mean", "n_epochs"],
    )
    wide = to_cesium_frame(out)
    assert isinstance(wide.columns, pd.MultiIndex)
    assert wide.loc["a", ("n_epochs", 0)] == 5.0
    assert wide.loc["a", ("n_epochs", 1)] == 10.0
    assert wide.loc["b", ("n_epochs", 0)] == 6.0
    assert np.isnan(wide.loc["b", ("n_epochs", 1)])  # single-channel series


def test_archive_extraction_roundtrip(tmp_path):
    """S3 (cesium/util.py::extract_time_series): tar.gz and zip of
    .dat series files featurize end-to-end; unsafe member paths are
    rejected."""
    import tarfile
    import zipfile

    import numpy as np
    import pytest as _pytest

    from cesium_ray.sources import extract_time_series, featurize_archive

    d = tmp_path / "series"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.sort(rng.uniform(0, 100, 50))
        m = rng.normal(0, 1, 50)
        np.savetxt(d / f"s{i}.dat", np.c_[t, m], delimiter=",")
    tar_p = tmp_path / "a.tar.gz"
    with tarfile.open(tar_p, "w:gz") as tf:
        for f in sorted(d.iterdir()):
            tf.add(f, arcname=f.name)
    zip_p = tmp_path / "a.zip"
    with zipfile.ZipFile(zip_p, "w") as zf:
        for f in sorted(d.iterdir()):
            zf.write(f, arcname=f.name)

    with extract_time_series(str(tar_p)) as paths:
        assert len(paths) == 3 and all(p.endswith(".dat") for p in paths)

    feats = ["mean", "std", "amplitude"]
    out_tar = featurize_archive(str(tar_p), features_to_use=feats)
    out_zip = featurize_archive(str(zip_p), features_to_use=feats)
    assert len(out_tar) == 3 and len(out_zip) == 3
    for c in feats:
        np.testing.assert_allclose(
            sorted(out_tar[c]), sorted(out_zip[c]), rtol=0, atol=0
        )

    evil = tmp_path / "evil.tar"
    with tarfile.open(evil, "w") as tf:
        ti = tarfile.TarInfo("../escape.dat")
        data = b"1,2\n"
        import io
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    with _pytest.raises(ValueError, match="unsafe"):
        with extract_time_series(str(evil)):
            pass


def test_featurize_npz_files_e3(tmp_path):
    """E3: TimeSeries.save → load → featurize workflow."""
    import numpy as np

    from cesium_ray.pipelines import featurize_npz_files, featurize_time_series
    from cesium_ray.timeseries import TimeSeries

    rng = np.random.default_rng(3)
    paths, raw = [], []
    for i in range(3):
        t = np.sort(rng.uniform(0, 50, 40))
        m = rng.normal(0, 1, 40)
        ts = TimeSeries(t=t, m=m, name=f"s{i}", label="c1",
                        meta_features={"mf": float(i)})
        p = str(tmp_path / f"s{i}.npz")
        ts.save(p)
        paths.append(p)
        raw.append((t, m))
    feats = ["mean", "std", "amplitude"]
    got = featurize_npz_files(paths, features_to_use=feats)
    want = featurize_time_series(
        times=[t for t, _ in raw], values=[m for _, m in raw],
        names=[f"s{i}" for i in range(3)], features_to_use=feats,
    )
    assert len(got) == 3
    assert set(got["label"]) == {"c1"} and "mf" in got.columns
    for c in feats:
        np.testing.assert_allclose(sorted(got[c]), sorted(want[c]), rtol=1e-12)
