"""Regression tests for the Ray 2.49 hash-shuffle schema-broadcast fix
(brinkray/engine/rayfix.py). Without the patch each of these raises
ArrowInvalid ("No match or multiple matches for key field reference")
from pyarrow's join when a partition's side arrives schema-less."""

import pyarrow as pa
import pytest


@pytest.fixture(autouse=True)
def _apply_fix(ray_session):
    from brinkray.engine.rayfix import apply

    apply()


def test_join_with_explicitly_empty_side(ray_session):
    import ray.data as rd

    left = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "a": pa.array([], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table(
            {"k2": pa.array([2, 3, 4], pa.int64()),
             "b": pa.array([5, 6, 7], pa.int64())}
        )
    )
    inner = left.join(right, join_type="inner", num_partitions=2,
                      on=("k",), right_on=("k2",)).to_pandas()
    assert len(inner) == 0
    full = left.join(right, join_type="full_outer", num_partitions=2,
                     on=("k",), right_on=("k2",)).to_pandas()
    assert sorted(full["k"]) == [2, 3, 4]


def test_join_fed_by_sort_aggregate_empty_blocks(ray_session):
    """The sort-based aggregate emits zero-column empty pandas blocks;
    when one is the first block shuffled into a join side the unpatched
    driver skips the schema broadcast and the join dies."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    rows = rd.from_pandas(df).repartition(3)
    agg = rows.groupby("k").aggregate(
        Sum("v", alias_name="s"), Count(alias_name="n")
    )

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["k2", "s", "n"])

    out = (
        rows.join(
            agg.map_batches(ren, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=2,
            on=("k",),
            right_on=("k2",),
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out[out["k"] == 1]["n"].tolist() == [3, 3, 3]
    assert out[out["k"] == 2]["s"].tolist() == [9.0, 9.0]


def test_apply_is_idempotent(ray_session):
    from ray.data._internal.execution.operators.hash_shuffle import (
        HashShufflingOperatorBase,
    )

    from brinkray.engine.rayfix import apply

    fn1 = HashShufflingOperatorBase._do_add_input_inner
    apply()
    assert HashShufflingOperatorBase._do_add_input_inner is fn1
    assert getattr(fn1, "_brinkray_patch", False)
