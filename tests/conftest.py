import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


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
    # Ray Data does NOT guarantee row order across blocks unless asked;
    # several tests align engine output to a pandas oracle by sorting on a
    # NON-unique key, which silently assumes input row order survives the
    # pipeline. Under CPU contention blocks complete out of order and such
    # a test flakes (seen: test_fill_clip_log_chain, ~1/10 under load).
    ctx.execution_options.preserve_order = True
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def mixed_df():
    """Reference-style mixed table (FIXTURES.md F2, conftest.py:120-198 analog):
    deterministic, with nulls injected into continuous columns."""
    rng = np.random.RandomState(42)
    n = 300
    names = ["Alice", "Bob", "Carol", "Dave", "Eve", "Zelda"]
    df = pd.DataFrame(
        {
            "id": rng.randint(0, 10, n).astype("int64"),
            "label": rng.randint(0, 2, n).astype("int64"),
            "name_cat": [names[i] for i in rng.randint(0, len(names), n)],
            "x": rng.normal(0, 1, n),
            "y": rng.uniform(0, 100, n),
            "z": rng.normal(5, 2, n),
        }
    )
    for col in ("x", "y", "z"):
        df.loc[rng.choice(n, 2, replace=False), col] = np.nan
    return df


@pytest.fixture()
def mixed_ds(mixed_df):
    import ray.data as rd

    table = pa.Table.from_pandas(mixed_df, preserve_index=False)
    return rd.from_arrow(table).repartition(3)
