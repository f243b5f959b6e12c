import numpy as np
import pandas as pd
import pytest

import cesium_ray  # noqa: F401  (sets malloc env before ray.init forks workers)
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_turns():
    """FIXTURES.md F1 tiny: 20 convs / ~400 turns."""
    from cesium_ray.synth import generate_turns

    return generate_turns(n_convs=20, seed=7)


@pytest.fixture(scope="session")
def small_turns():
    from cesium_ray.synth import generate_turns

    return generate_turns(n_convs=300, seed=11)


@pytest.fixture(scope="session")
def tiny_points(tiny_turns):
    from cesium_ray.oracle.rollup import derive_channels_pandas

    return derive_channels_pandas(tiny_turns.to_pandas())
