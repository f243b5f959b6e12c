"""Per-turn text-equality invariant (BASELINE.json input_hint): any
pipeline that carries `text` must preserve it byte-for-byte under the
stable (conv_id, turn_idx) ordering."""

import numpy as np
import pandas as pd
import ray.data

from cesium_ray.stages import normalize_turns, with_partition


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_normalize_preserves_text_bytes(tiny_turns, tmp_path):
    ds = normalize_turns(ray.data.from_arrow(tiny_turns))
    out_dir = str(tmp_path / "turns_out")
    ds.write_parquet(out_dir)
    back = _canon(ray.data.read_parquet(out_dir).to_pandas())
    orig = _canon(tiny_turns.to_pandas())
    assert (back["text"].to_numpy() == orig["text"].to_numpy()).all()
    # role/tool/ts also untouched
    assert (back["role"].to_numpy() == orig["role"].to_numpy()).all()
    np.testing.assert_array_equal(
        back["ts"].to_numpy("datetime64[us]"), orig["ts"].to_numpy("datetime64[us]")
    )


def test_shuffle_roundtrip_preserves_text(tiny_turns):
    """Text survives the conv-hash exchange bit-exactly."""
    ds = with_partition(
        normalize_turns(ray.data.from_arrow(tiny_turns)), 8, key="conv_id"
    )
    out = ds.groupby("_part").map_groups(
        lambda df: df.drop(columns=["_part"]), batch_format="pandas"
    )
    back = _canon(out.to_pandas())[["conv_id", "turn_idx", "text"]]
    orig = _canon(tiny_turns.to_pandas())[["conv_id", "turn_idx", "text"]]
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), orig.reset_index(drop=True), check_dtype=False
    )
