"""Semi-structured parsing stages — the messy-input edge of a web
pipeline: JSON property extraction with DEAD-LETTER routing (malformed
rows become a side channel instead of failing the whole run — at
100-TB crawl scale some fraction of every batch is garbage and a
pipeline that dies on row 10^11 is useless).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "parse_json_int_field",
    "json_field_stats",
]


def parse_json_int_field(ds, json_col: str, field: str, id_col: str):
    """Parse ``json_col`` per row and extract integer ``field``.
    Returns (id, value, ok): rows that fail to parse (or lack the
    field / hold a non-int) get ok=0 and value=-1 — the dead-letter
    channel rides the same table as a flag column, so the caller can
    route `.filter(ok == 0)` to a quarantine sink while the good rows
    stream on, with no second pass over the input. Stateless
    map_batches; the per-row json.loads is the honest cost of
    schema-on-read (string-bound, like the tokenizer stages).
    """

    def fn(t: pa.Table) -> pa.Table:
        vals = np.full(t.num_rows, -1, dtype=np.int64)
        oks = np.zeros(t.num_rows, dtype=np.int8)
        for i, s in enumerate(t[json_col].to_pylist()):
            try:
                v = json.loads(s)[field]
            except (TypeError, ValueError, KeyError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            vals[i] = v
            oks[i] = 1
        return pa.table(
            {
                id_col: t[id_col],
                "value": pa.array(vals, pa.int64()),
                "ok": pa.array(oks, pa.int8()),
            }
        )

    return ds.select_columns([id_col, json_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def json_field_stats(ds, json_col: str, field: str, group_col: str):
    """Per-group stats (n, sum, min, max) of an integer JSON property —
    parse + aggregate in one streaming pass (per-block partial
    aggregation shrinks the exchange to |groups| rows per block).
    Malformed rows are COUNTED per group (n_bad) rather than silently
    dropped — the no-silent-caps rule applied to parsing.
    """
    from ray.data.aggregate import Max, Min, Sum

    # Min/Max identities for groups whose block has no parseable row —
    # only bad values ever see them; a group that is 100% dead letters
    # reports these sentinels (and n = 0), never a fabricated 0.
    LO, HI = -(2**62), 2**62

    def fn(t: pa.Table) -> pa.Table:
        groups, vals, oks = [], [], []
        for g, s in zip(t[group_col].to_pylist(), t[json_col].to_pylist()):
            try:
                v = json.loads(s)[field]
                ok = not isinstance(v, bool) and isinstance(v, int)
            except (TypeError, ValueError, KeyError):
                v, ok = None, False
            groups.append(g)
            vals.append(int(v) if ok else 0)
            oks.append(1 if ok else 0)
        df = pd.DataFrame({group_col: groups, "v": vals, "ok": oks})
        good = df[df["ok"] == 1]
        gstats = good.groupby(group_col).agg(
            n=("v", "size"), k_sum=("v", "sum"),
            k_min=("v", "min"), k_max=("v", "max"),
        )
        allc = df.groupby(group_col).size().rename("total")
        part = gstats.reindex(allc.index).join(allc).reset_index()
        part["n"] = part["n"].fillna(0).astype("int64")
        part["n_bad"] = (part["total"] - part["n"]).astype("int64")
        part["k_sum"] = part["k_sum"].fillna(0).astype("int64")
        part["k_min"] = part["k_min"].fillna(HI).astype("int64")
        part["k_max"] = part["k_max"].fillna(LO).astype("int64")
        return pa.Table.from_pandas(
            part[[group_col, "n", "n_bad", "k_sum", "k_min", "k_max"]],
            preserve_index=False,
        )

    return (
        ds.select_columns([group_col, json_col])
        .map_batches(fn, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_bad", alias_name="n_bad"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )
