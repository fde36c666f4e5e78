"""Z-order (Morton) multi-dimensional clustering — the data-layout
optimization behind Delta/Iceberg ``ZORDER BY``: interleaving the bits
of two sort dimensions gives a single sort key whose ranges are
2-D-local, so min/max pruning works for range predicates on EITHER
column after one re-sort (a plain compound sort only prunes the
leading column).

Exactness: the Morton key is pure integer bit arithmetic —
bit-identically replayable in SQL with ``>> & <<`` (one term per bit,
the generate_series zip idiom).

Scale shape: key computation is a zero-shuffle vectorized numpy pass;
``zorder_sort`` then pays exactly ONE range-partitioned sort shuffle
(the same cost any layout rewrite pays) and should be followed by a
partitioned ``write_parquet`` so downstream reads prune on the
persisted zkey ranges.

Reference anchor: the reference has no layout stage (single-file
ingestion); this is infrastructure its pipelines would need at crawl
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def morton_key(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` bits of two non-negative int arrays
    (x → even bit positions, y → odd). Values must fit ``bits`` bits
    (caller clamps/buckets first — quantize floats to rank buckets)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if bits < 1 or bits > 31:
        raise ValueError("morton_key: bits in [1, 31]")
    lim = np.int64(1) << bits
    if len(x) and (x.min() < 0 or y.min() < 0 or x.max() >= lim
                   or y.max() >= lim):
        raise ValueError(f"morton_key: values must be in [0, 2^{bits})")
    z = np.zeros(len(x), dtype=np.int64)
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def zorder_key(ds, x_col: str, y_col: str, bits: int = 16,
               out_col: str = "zkey"):
    """Append the Morton key of (x_col, y_col) — zero shuffle."""
    def add(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        return t.append_column(out_col,
                               pa.array(morton_key(x, y, bits)))

    return ds.map_batches(add, batch_format="pyarrow")


def zorder_sort(ds, x_col: str, y_col: str, bits: int = 16,
                out_col: str = "zkey"):
    """Morton key + ONE global range-partitioned sort on it — blocks
    then hold 2-D-local tiles (write them partitioned so both x- and
    y-range reads prune)."""
    return zorder_key(ds, x_col, y_col, bits, out_col).sort(out_col)
