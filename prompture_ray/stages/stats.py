"""Per-column statistics accumulation + distribution drift scoring.

Implements the north-star stats checks: HLL (cardinality), KLL (quantiles
over text length), count-min + exact top-k (category frequencies), fixed-bin
histograms (drift). Partial sketches are produced per batch inside the
validation pass (one linear scan over the data for the whole suite) and
merged associatively — per-partition partials first, then a driver-side
streaming fold; both levels are the classic partial+final tree reduction
(SURVEY §2.5, Aggregation-at-scale pattern).

Drift: PSI + KS of the live distributions against a pinned baseline
snapshot (FIXTURES.md §5). The baseline fixes the histogram bin edges so
live and reference counts are directly comparable.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prompture_ray.functions.sketches import (
    HLL, KLL, CountMin, TopK, Hist, hash64, psi, ks_from_hist,
)
from prompture_ray.specs import CheckSpec

DEFAULT_LEN_EDGES = np.logspace(0, 6, 33)  # 32 log bins over [1, 1e6] chars


def _numeric_view(col: pa.Array) -> np.ndarray:
    """Numeric view of a column for quantile/histogram sketches: values for
    numeric columns, utf8 length for strings, binary length for binary."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = pc.utf8_length(col)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        col = pc.binary_length(col)
    elif pa.types.is_timestamp(t):
        col = pc.cast(col, pa.int64())
    arr = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return arr[~np.isnan(arr)]


def _string_view(col: pa.Array) -> np.ndarray:
    vals = pc.cast(col.drop_null(), pa.string()).to_pylist()
    return np.asarray(vals, dtype=object)


class StatsAccumulator:
    """One set of sketch objects for the stats checks of a suite."""

    def __init__(self, stats_checks: list[CheckSpec],
                 hist_edges: dict[str, list] | None = None):
        self.checks = stats_checks
        self.sketches: dict[str, dict[str, object]] = {}
        for c in stats_checks:
            sk: dict[str, object] = {}
            for name in c.sketches or ("hll",):
                if name == "hll":
                    sk["hll"] = HLL(p=14)
                elif name == "kll":
                    sk["kll"] = KLL(k=200)
                elif name == "countmin":
                    sk["countmin"] = CountMin()
                elif name == "topk":
                    sk["topk"] = TopK(k=20)
                else:
                    raise ValueError(f"unknown sketch {name!r} in check {c.id}")
            edges = (hist_edges or {}).get(c.id, DEFAULT_LEN_EDGES)
            sk["hist"] = Hist(edges)  # always kept: basis for drift PSI/KS
            self.sketches[c.id] = sk

    def update(self, batch: pa.Table,
               hash_cache: dict | None = None) -> None:
        """Accumulate one batch. ``hash_cache`` maps column name → uint64
        hashes of the column's non-null values, letting the fused pipeline
        share ONE hash pass per column between uniqueness, referential and
        HLL sketches (allocation churn in hot batches is what limits
        multi-worker scaling)."""
        for c in self.checks:
            if c.column not in batch.column_names:
                continue
            col = batch[c.column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sk = self.sketches[c.id]
            num = None
            for name, obj in sk.items():
                if name in ("kll", "hist"):
                    if num is None:
                        num = _numeric_view(col)
                    obj.update_array(num)
                elif name == "hll":
                    h = (hash_cache or {}).get(c.column)
                    if h is None:
                        h = hash64(_string_view(col))
                        if hash_cache is not None:
                            hash_cache[c.column] = h
                    obj.update_hashes(h)
                elif name in ("countmin", "topk"):
                    # category columns have few uniques: count with the
                    # Arrow kernel, update sketches with (values, counts)
                    vc = col.drop_null().value_counts()
                    vals = np.asarray(vc.field("values").to_pylist(),
                                      dtype=object)
                    cnts = vc.field("counts").to_numpy(zero_copy_only=False)
                    if len(vals):
                        obj.update_array(vals, counts=cnts)

    def merge(self, other: "StatsAccumulator") -> "StatsAccumulator":
        for cid, sk in other.sketches.items():
            mine = self.sketches.get(cid)
            if mine is None:
                self.sketches[cid] = sk
                continue
            for name, obj in sk.items():
                if name in mine:
                    mine[name].merge(obj)
                else:
                    mine[name] = obj
        return self

    def dumps(self) -> bytes:
        return pickle.dumps(self.sketches, protocol=pickle.HIGHEST_PROTOCOL)

    def merge_bytes(self, blob: bytes) -> None:
        other = pickle.loads(blob)
        for cid, sk in other.items():
            mine = self.sketches.get(cid)
            if mine is None:
                self.sketches[cid] = sk
                continue
            for name, obj in sk.items():
                if name in mine:
                    mine[name].merge(obj)
                else:
                    mine[name] = obj

    def summaries(self) -> dict:
        out = {}
        for cid, sk in self.sketches.items():
            out[cid] = {name: obj.summary() for name, obj in sk.items()
                        if hasattr(obj, "summary")}
        return out


# ---------------------------------------------------------------------------
# Drift baseline + scoring
# ---------------------------------------------------------------------------
def create_baseline(table: pa.Table, text_col: str = "text",
                    cat_col: str = "lang", key_col: str = "url") -> dict:
    """Pinned drift snapshot from a clean slice (FIXTURES.md §5)."""
    hist = Hist(DEFAULT_LEN_EDGES)
    hist.update_array(_numeric_view(table[text_col].combine_chunks()
                                    if isinstance(table[text_col], pa.ChunkedArray)
                                    else table[text_col]))
    cat = table[cat_col]
    if isinstance(cat, pa.ChunkedArray):
        cat = cat.combine_chunks()
    vc = cat.drop_null().value_counts()
    total = max(1, len(cat) - cat.null_count)
    freq = {str(v): int(c) / total
            for v, c in zip(vc.field("values").to_pylist(),
                            vc.field("counts").to_pylist())}
    hll = HLL(p=14)
    hll.update_hashes(hash64(_string_view(
        table[key_col].combine_chunks() if isinstance(table[key_col], pa.ChunkedArray)
        else table[key_col])))
    return {
        "version": 1,
        "rows": table.num_rows,
        "text_len_hist": hist.summary(),
        "cat_freq": freq,
        "key_cardinality": hll.estimate(),
    }


def save_baseline(baseline: dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(baseline, sort_keys=True))


def load_baseline(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())


def score_drift(baseline: dict, live_hist: Hist, live_cat_freq: dict) -> dict:
    """PSI + KS of live distributions vs the pinned baseline."""
    base_hist = Hist.from_summary(baseline["text_len_hist"])
    out = {
        "text_len_psi": round(psi(base_hist.probs(), live_hist.probs()), 6),
        "text_len_ks": round(ks_from_hist(base_hist.counts, live_hist.counts), 6),
    }
    cats = sorted(set(baseline["cat_freq"]) | set(live_cat_freq))
    e = np.array([baseline["cat_freq"].get(c, 0.0) for c in cats])
    a = np.array([live_cat_freq.get(c, 0.0) for c in cats])
    out["cat_psi"] = round(psi(e, a), 6) if len(cats) else 0.0
    return out
