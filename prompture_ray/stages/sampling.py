"""Deterministic sampling operators for training-data curation.

``ds.random_sample`` is nondeterministic across runs/block layouts; these
operators decide membership from a PURE FUNCTION of the row's id, so the
sample is reproducible, resumable (a re-run keeps the same rows), and
auditable in SQL. Selection rule: Knuth multiplicative hashing —
keep iff (id * 2654435761) mod 2^32 < fraction * 2^32 — which both numpy
(uint64) and any SQL engine (BIGINT arithmetic) evaluate identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_MOD = np.uint64(1) << np.uint64(32)


def _keep_mask(ids: np.ndarray, fractions: np.ndarray) -> np.ndarray:
    h = (ids.astype(np.uint64) * _KNUTH) % _MOD
    thresh = np.floor(fractions * float(2 ** 32)).astype(np.uint64)
    return h < thresh


def deterministic_sample(ds, id_col: str, fraction: float):
    """Keep a reproducible ``fraction`` of rows keyed by an integer id."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = _keep_mask(ids, np.full(len(ids), fraction))
        return t.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, id_col: str, strata_col: str,
                      fractions: dict, default: float = 1.0):
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value → keep fraction (missing strata keep ``default``). The strata
    map is tiny and ships inside the task closure — no shuffle, no
    driver-side pass; output is stable under any block layout."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        strata = t[strata_col].to_pylist()
        fr = np.array([fractions.get(s, default) for s in strata])
        return t.filter(pa.array(_keep_mask(ids, fr)))

    return ds.map_batches(fn, batch_format="pyarrow")


def assign_splits(ds, key_col: str, splits, out_col: str = "split"):
    """Deterministic train/val/test split assignment: every row gets the
    split chosen by its key's Knuth bucket — reproducible under any
    block layout, resumable, auditable in SQL (same rule as
    ``deterministic_sample``).

    ``splits``: ordered [(name, fraction), ...] summing to 1.0 (±1e-9).
    Leakage-safe GROUP splits fall out of the key choice: pass a group
    key column (e.g. a domain id) instead of the row id and every row of
    a group — including near-duplicates kept within one group — lands in
    the same split.
    """
    names = [n for n, _ in splits]
    fr = np.asarray([f for _, f in splits], dtype=np.float64)
    if abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {fr.sum()})")
    thresh = np.floor(np.cumsum(fr) * float(2 ** 32)).astype(np.uint64)
    thresh[-1] = np.uint64(2 ** 32)          # close rounding gap at the top
    names_arr = pa.array(names, type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids.astype(np.uint64) * _KNUTH) % _MOD
        idx = np.searchsorted(thresh, h, side="right")
        col = names_arr.take(pa.array(idx.astype(np.int64)))
        return t.append_column(out_col, col)

    return ds.map_batches(fn, batch_format="pyarrow")
