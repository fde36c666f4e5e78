"""ROLLUP aggregation: every prefix level of a dimension list —
(a, b), (a), () — computed in ONE pass over the data.

Reference analogue: the suite report's nested rollups (per-check, then
per-column, then suite totals — prompture's validation report folds the
same counts at three levels). Generalized to SQL ``GROUP BY ROLLUP``
semantics over a Dataset.

Scale shape: a per-batch pandas partial emits (sum, count) rows for ALL
levels at once (rolled-up dimensions take the ``__all__`` sentinel), so
the data is scanned once and only tiny partial rows enter the single
grouped shuffle — the map-side-combine discipline every wide aggregate
in this repo follows. Levels don't multiply the shuffle: level-l
partials are bounded by the level-l group count per batch, and the
sentinel keys keep every level in ONE groupby.
"""

from __future__ import annotations

import pandas as pd

ALL = "__all__"


def rollup_aggregate(ds, dims: list[str], value_col: str):
    """Sum + count of ``value_col`` at every ROLLUP prefix level of
    ``dims``. Dimension columns are cast to string (the sentinel lives
    in the same column); output columns: dims..., total, n."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        for d in dims:
            b[d] = b[d].astype(str)
        outs = []
        for lvl in range(len(dims), -1, -1):
            keys = dims[:lvl]
            if keys:
                g = b.groupby(keys, sort=False)[value_col] \
                    .agg(total="sum", n="count").reset_index()
            else:
                g = pd.DataFrame({"total": [b[value_col].sum()],
                                  "n": [len(b)]})
            for d in dims[lvl:]:
                g[d] = ALL
            outs.append(g[dims + ["total", "n"]])
        out = pd.concat(outs, ignore_index=True)
        out["total"] = out["total"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(dims).aggregate(Sum("total", alias_name="total"),
                                 Sum("n", alias_name="n"))
