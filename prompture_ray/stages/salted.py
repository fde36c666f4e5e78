"""Salted grouped aggregation for skewed keys.

The web corpus' ``lang``/domain distributions are Zipfian (SURVEY §4
"skew"): a bare ``groupby("lang")`` sends every "en" row to one reducer.
Salting splits each hot key across S sub-keys: phase 1 aggregates per
``(key, salt)`` — S-way parallel even for the hottest key — phase 2
merges the S partials per key (tiny). Correct for any
commutative/associative aggregate set; here count/sum/min/max.

Skew-mitigation by key-splitting follows the approach of FP-Hadoop
(VLDB 2015, see PAPERS.md) adapted to Ray Data two-phase aggregation.

This composes with the partial-per-batch combiner: batches already
pre-aggregate, so phase 1's shuffle moves at most
``distinct_keys × S × blocks`` rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_groupby_stats(ds, key: str, value: str, n_salt: int = 8):
    """(key, n, sum_v, min_v, max_v) via salted two-phase aggregation."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def phase1_partial(t: pa.Table) -> pa.Table:
        # per-batch combine, salt assigned per batch-row position so a hot
        # key inside one batch still spreads across salts deterministically
        salt = pa.array(np.arange(t.num_rows, dtype=np.int64) % n_salt)
        g = pa.table({key: t[key], "salt": salt, value: t[value]}) \
            .group_by([key, "salt"]).aggregate([
                (value, "count"), (value, "sum"),
                (value, "min"), (value, "max")])
        return g.rename_columns([key, "salt", "n", "s", "mn", "mx"])

    phase1 = ds.map_batches(phase1_partial, batch_format="pyarrow") \
        .groupby([key, "salt"]).aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))

    phase2 = phase1.groupby(key).aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="sum_v"),
        Min("mn", alias_name="min_v"), Max("mx", alias_name="max_v"))

    def final(t: pa.Table) -> pa.Table:
        return t.select([key, "n", "sum_v", "min_v", "max_v"])

    return phase2.map_batches(final, batch_format="pyarrow")
