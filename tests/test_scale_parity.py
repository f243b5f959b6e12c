"""Mid-scale parity (beyond tiny fixtures): ~500k synthetic turns
through the full distributed flagship must stay bit-equal to the
single-node oracle per tier (FIXTURES.md F5 at 'small'+ scale)."""

import glob

import pandas as pd
import ray.data

from cesium_ray.oracle.rollup import derive_channels_pandas, rollup_pandas
from cesium_ray.pipelines import run_flagship
from cesium_ray.synth import generate_turns


def test_flagship_parity_at_half_million_turns(tmp_path):
    turns = generate_turns(n_convs=2000, seed=77)
    assert turns.num_rows > 300_000
    out = str(tmp_path / "scale")
    metrics = run_flagship(
        ray.data.from_arrow(turns),
        out,
        num_partitions=16,
        tiers=("1h", "1d"),
        features=None,
        codec=False,
        gapfill_tier=None,
        resume=False,
    )
    assert metrics.rows_in.sum() == turns.num_rows

    pdf = turns.to_pandas()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    pts = derive_channels_pandas(pdf[["conv_id", "turn_idx", "ts", "text_len"]])
    for tier in ("1h", "1d"):
        files = glob.glob(f"{out}/tier={tier}/date=*/part-*.parquet")
        got = (
            pd.concat([pd.read_parquet(f) for f in files])
            .sort_values(["conv_id", "channel", "bucket"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = (
            rollup_pandas(pts, tier)
            .sort_values(["conv_id", "channel", "bucket"], kind="mergesort")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_exact=True)
