"""JSON schema-on-read parsing with dead-letter routing."""

import pandas as pd
import pyarrow as pa


def _mixed_ds():
    import ray.data as rd

    rows = [
        '{"k": 5}', '{"k": 11}', 'not json', '{"other": 1}',
        '{"k": "str"}', '{"k": true}', None, '{"k": -3}',
    ]
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "event_type": pa.array(
                    ["a", "b", "a", "b", "a", "b", "a", "b"]
                ),
                "props": pa.array(rows, pa.string()),
            }
        )
    ).repartition(3)


def test_parse_json_int_field_dead_letter(ray_session):
    from brinkray.textproc.parse import parse_json_int_field

    out = (
        parse_json_int_field(_mixed_ds(), json_col="props", field="k",
                             id_col="event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["ok"].tolist() == [1, 1, 0, 0, 0, 0, 0, 1]
    assert out[out["ok"] == 1]["value"].tolist() == [5, 11, -3]
    assert (out[out["ok"] == 0]["value"] == -1).all()


def test_json_field_stats_counts_bad_rows(ray_session):
    from brinkray.textproc.parse import json_field_stats

    out = (
        json_field_stats(_mixed_ds(), json_col="props", field="k",
                         group_col="event_type")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    a = out[out["event_type"] == "a"].iloc[0]
    b = out[out["event_type"] == "b"].iloc[0]
    # a: good {5}, bad {not json, "str", None} -> n=1 n_bad=3
    assert (a["n"], a["n_bad"], a["k_sum"], a["k_min"], a["k_max"]) == (1, 3, 5, 5, 5)
    # b: good {11, -3}, bad {other-missing, true} -> n=2 n_bad=2
    assert (b["n"], b["n_bad"], b["k_sum"], b["k_min"], b["k_max"]) == (2, 2, 8, -3, 11)
