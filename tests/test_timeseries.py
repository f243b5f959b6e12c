"""TimeSeries container tests (cesium/tests/test_time_series.py
semantics: broadcast/ragged channels, sort, save/load round-trip)."""

import numpy as np
import pytest

from cesium_ray.sources.timeseries_io import DEFAULT_ERROR_VALUE, DEFAULT_MAX_TIME
from cesium_ray.timeseries import TimeSeries, load


def test_defaults():
    ts = TimeSeries(m=[1.0, 2.0, 3.0])
    t, m, e = next(ts.channels())
    np.testing.assert_allclose(t, np.linspace(0, DEFAULT_MAX_TIME, 3))
    np.testing.assert_allclose(e, DEFAULT_ERROR_VALUE)


def test_broadcast_shared_t():
    t = np.arange(4.0)
    ts = TimeSeries(t=t, m=[np.ones(4), np.zeros(4)])
    chans = list(ts.channels())
    assert len(chans) == 2
    np.testing.assert_array_equal(chans[0][0], t)
    np.testing.assert_array_equal(chans[1][0], t)


def test_ragged_channels_default_fill():
    ts = TimeSeries(t=np.arange(4.0), m=[np.ones(4), np.zeros(2)])
    chans = list(ts.channels())
    assert len(chans[1][0]) == 2  # ragged channel got its own default grid


def test_sort():
    ts = TimeSeries(t=[3.0, 1.0, 2.0], m=[30.0, 10.0, 20.0])
    ts.sort()
    t, m, e = next(ts.channels())
    np.testing.assert_array_equal(t, [1, 2, 3])
    np.testing.assert_array_equal(m, [10, 20, 30])


def test_save_load_roundtrip(tmp_path):
    ts = TimeSeries(
        t=np.arange(5.0), m=np.arange(5.0) ** 2, e=np.full(5, 0.1),
        label="cls", meta_features={"m1": 1.5}, name="s1",
    )
    p = str(tmp_path / "ts.npz")
    ts.save(p)
    back = load(p)
    assert back.label == "cls" and back.name == "s1"
    assert back.meta_features == {"m1": 1.5}
    for (t1, m1, e1), (t2, m2, e2) in zip(ts.channels(), back.channels()):
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(e1, e2)


def test_2d_array_channels():
    """ADVICE round 1: (n_channels, n) ndarray inputs for m/t/e must be
    treated as channel lists, not silently replaced by defaults."""
    import numpy as np
    from cesium_ray.timeseries import TimeSeries

    m = np.arange(6.0).reshape(2, 3)
    t = np.array([[0.0, 1.0, 2.0], [0.0, 10.0, 20.0]])
    ts = TimeSeries(t=t, m=m)
    assert ts.n_channels == 2
    np.testing.assert_array_equal(ts.t[1], [0.0, 10.0, 20.0])
    np.testing.assert_array_equal(ts.m[0], [0.0, 1.0, 2.0])


def test_jsonl_turns_roundtrip_exact(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from cesium_ray.sources.transcripts import (
        read_turns_jsonl, write_turns_jsonl)
    from cesium_ray.synth import generate_turns

    turns = generate_turns(30, seed=11)
    out = str(tmp_path / "jsonl")
    write_turns_jsonl(ray.data.from_arrow(turns), out)
    back = (read_turns_jsonl(out).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    orig = (turns.to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))
    assert len(back) == len(orig)
    # per-turn text equality under stable (conv_id, turn_idx) order
    assert (back["text"].to_numpy() == orig["text"].to_numpy()).all()
    # µs-exact timestamps through the int64 round-trip
    assert (back["ts"].to_numpy("datetime64[us]")
            == orig["ts"].to_numpy("datetime64[us]")).all()
    assert back["turn_idx"].dtype == np.int32


def test_jsonl_reader_fractional_second_strings(ray_session, tmp_path):
    import json as _json

    import ray.data

    from cesium_ray.sources.transcripts import read_turns_jsonl

    p = tmp_path / "frac.jsonl"
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
         "tool": None, "ts": "2024-01-01T00:00:00.123456"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo",
         "tool": None, "ts": "2024-01-01T00:00:01"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    back = read_turns_jsonl(str(p)).to_pandas().sort_values("turn_idx")
    tus = back["ts"].to_numpy("datetime64[us]").view("int64")
    assert tus[0] % 10**6 == 123456  # µs fraction preserved
    assert tus[1] - tus[0] == 876544
