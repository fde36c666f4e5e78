"""Vectorized type coercion with per-row fallback-to-default.

The Ray-Data-native form of the reference's ``convert_value`` tree
(reference prompture/extraction/tools.py:409-748: cast to target type,
failure → field default → type default, with shorthand-number and
multilingual-boolean parsing) and ``normalize_field_value``
(prompture/extraction/core.py:198-252: empty string/list → default or
null). A failed parse is a VERDICT, not a task failure (SURVEY §4
retry row): rows that fall back are flagged in a ``<col>__used_default``
column, mirroring the reference's per-field
``{status, used_default}`` results (core.py:1482-1537).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prompture_ray.functions.textfuncs import (
    parse_boolean_batch, parse_shorthand_number,
)

TYPE_DEFAULTS = {
    "int64": 0, "float64": 0.0, "bool": False, "string": "",
}


def coerce_column(col, target: str, default=None,
                  shorthand: bool = False,
                  valid_mask=None) -> tuple[pa.Array, pa.Array]:
    """Cast ``col`` (string-ish) to ``target`` type; rows that fail get
    ``default`` (or the type default). Returns (values, used_default).

    ``valid_mask`` optionally overrides "the input existed" — e.g. when
    ``col`` is the output of an extraction over a source column, pass the
    SOURCE's validity so extraction-miss-on-present-source counts as a
    failed parse (default + flag) instead of a null input (null, no flag).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if valid_mask is not None and isinstance(valid_mask, pa.ChunkedArray):
        valid_mask = valid_mask.combine_chunks()
    if default is None:
        default = TYPE_DEFAULTS.get(target)

    if target == "bool":
        parsed = parse_boolean_batch(col)
    elif target in ("int64", "float64"):
        s = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
        if shorthand:
            vals = [parse_shorthand_number(v) for v in s.to_pylist()]
            parsed = pa.array(vals, type=pa.float64())
        else:
            # strip thousands separators then try the arrow cast per row
            s = pc.replace_substring(s, ",", "")
            parsed = pa.array(
                [_try_float(v) for v in s.to_pylist()], type=pa.float64())
        if target == "int64":
            rounded = pc.round(parsed)
            parsed = pc.cast(rounded, pa.int64(), safe=False)
    elif target == "string":
        parsed = pc.cast(col, pa.string())
        # empty-string normalization (core.py:214-222): '' → default
        parsed = pc.if_else(pc.equal(pc.utf8_trim_whitespace(parsed), ""),
                            pa.scalar(None, pa.string()), parsed)
    elif target == "timestamp":
        parsed = pa.array(
            [_try_ts(v) for v in pc.cast(col, pa.string()).to_pylist()],
            type=pa.timestamp("us"))
    else:
        raise ValueError(f"unsupported coercion target {target!r}")

    src_valid = valid_mask if valid_mask is not None else pc.is_valid(col)
    used_default = pc.and_(pc.is_null(parsed), src_valid)
    target_type = parsed.type
    if default is not None:
        filled = pc.fill_null(parsed, pa.scalar(default, type=target_type))
        # only fill rows where the INPUT existed; null input stays null
        out = pc.if_else(src_valid, filled, parsed)
    else:
        out = parsed
    return out, used_default


def _try_float(v):
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _try_ts(v):
    import datetime as dt
    if v is None:
        return None
    try:
        return dt.datetime.fromisoformat(v)
    except ValueError:
        return None


def coerce_batch_fn(spec: dict):
    """map_batches body coercing several columns.

    ``spec``: {col: {"target": ..., "default": ..., "shorthand": bool}}.
    Appends ``<col>__coerced`` + ``<col>__used_default`` columns.
    """

    def fn(t: pa.Table) -> pa.Table:
        for col, cfg in spec.items():
            vals, used = coerce_column(t[col], cfg["target"],
                                       cfg.get("default"),
                                       cfg.get("shorthand", False))
            t = t.append_column(f"{col}__coerced", vals)
            t = t.append_column(f"{col}__used_default", used)
        return t

    return fn
