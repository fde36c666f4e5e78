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
