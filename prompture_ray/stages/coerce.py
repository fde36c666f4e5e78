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

#: sentinel: "do not fill failed parses" (leave them null) — distinct from
#: default=None which means "use the type default"
NO_DEFAULT = object()


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
    if default is NO_DEFAULT:
        default = None
    elif default is None:
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
    elif target == "date":
        # reference tools.py:698-706: parse as datetime, take .date()
        parsed = pa.array(
            [_try_date(v) for v in pc.cast(col, pa.string()).to_pylist()],
            type=pa.date32())
    elif target == "uuid":
        # reference tools.py:718-726: uuid.UUID(str(value)) — canonical
        # lowercase-hyphenated output; invalid → fallback
        parsed = pa.array(
            [_try_uuid(v) for v in pc.cast(col, pa.string()).to_pylist()],
            type=pa.string())
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


def _try_date(v):
    import datetime as dt
    if v is None:
        return None
    try:
        return dt.date.fromisoformat(v[:10]) if len(v) >= 10 else None
    except (ValueError, TypeError):
        return None


def _try_uuid(v):
    import uuid as _uuid
    if v is None:
        return None
    try:
        return str(_uuid.UUID(v.strip()))
    except (ValueError, AttributeError, TypeError):
        return None


def coerce_list_column(col, item_target: str, default=None,
                       item_default=None) -> tuple[pa.Array, pa.Array]:
    """String column → ``list<item_target>`` with per-item fallback.

    The columnar form of the reference's ``list[T]`` branch
    (tools.py:520-546): split the string into items (JSON-array strings
    parse as JSON; otherwise ``as_list``'s ,;| split), coerce each item to
    ``item_target``, and a failing item becomes the ITEM-TYPE default
    (dropped if no default exists) rather than failing the row.

    Vectorized shape: one flat pass — split all rows, coerce the flattened
    item column with ``coerce_column`` (one kernel, not per-row), then
    re-wrap with list offsets. Returns (list_values, used_default) where
    used_default flags rows in which ≥1 item fell back.
    """
    import json as _json

    from prompture_ray.functions.textfuncs import as_list

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if item_default is None:
        item_default = TYPE_DEFAULTS.get(item_target)

    offsets = [0]
    flat: list = []
    null_rows = np.zeros(len(col), dtype=bool)
    for i, v in enumerate(col.to_pylist()):
        if v is None:
            null_rows[i] = True
            offsets.append(len(flat))
            continue
        s = v.strip() if isinstance(v, str) else v
        items = None
        if isinstance(s, str) and s.startswith("["):
            try:
                parsed = _json.loads(s)
                if isinstance(parsed, list):
                    items = parsed
            except ValueError:
                items = None
        if items is None:
            items = as_list(v)
        flat.extend(items)
        offsets.append(len(flat))

    flat_col = pa.array([None if x is None else str(x) for x in flat],
                        type=pa.string())
    vals, item_used = coerce_column(flat_col, item_target,
                                    default=item_default)
    list_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), vals)
    if null_rows.any():
        list_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), vals,
            mask=pa.array(null_rows))
    # row used_default = any item in the row fell back
    used_np = np.asarray(item_used.to_numpy(zero_copy_only=False),
                         dtype=bool)
    row_used = np.zeros(len(col), dtype=bool)
    for i in range(len(col)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi > lo and used_np[lo:hi].any():
            row_used[i] = True
    return list_arr, pa.array(row_used, type=pa.bool_())


def coerce_dict_column(col) -> tuple[pa.Array, pa.Array]:
    """String column of JSON objects → canonical (sorted-key) JSON object
    strings. The columnar form of the reference's dict branch
    (tools.py:580-606): a non-mapping or unparseable value is a failed
    parse. Returns (canonical_json, used_default) — failed rows are null
    + flagged (callers fill defaults per their spec)."""
    import json as _json

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out: list = []
    used = np.zeros(len(col), dtype=bool)
    for i, v in enumerate(col.to_pylist()):
        if v is None:
            out.append(None)
            continue
        try:
            parsed = _json.loads(v)
        except (ValueError, TypeError):
            parsed = None
        if isinstance(parsed, dict):
            out.append(_json.dumps(parsed, sort_keys=True,
                                   separators=(",", ":")))
        else:
            out.append(None)
            used[i] = True
    return pa.array(out, type=pa.string()), pa.array(used, type=pa.bool_())


#: canonical string rendering per union member type (the one-column output
#: of a union coercion must hold every member, so values are rendered to
#: strings deterministically)
def _render_string(parsed: pa.Array, target: str) -> pa.Array:
    if target == "bool":
        return pc.if_else(parsed, "true", "false")
    if target == "timestamp":
        # arrow's %S renders subseconds; truncate to second resolution
        return pc.strftime(pc.cast(parsed, pa.timestamp("s"), safe=False),
                           format="%Y-%m-%dT%H:%M:%S")
    if target == "date":
        return pc.strftime(pc.cast(parsed, pa.timestamp("us")),
                           format="%Y-%m-%d")
    return pc.cast(parsed, pa.string())


def coerce_union_column(col, targets: tuple[str, ...],
                        default=None) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Union try-in-order (reference tools.py:496-517): each row is coerced
    by the FIRST member type that parses it. Vectorized as one
    ``coerce_column`` pass per member (k kernel passes, not n rows), then a
    per-row first-success select.

    Returns (value: string canonical rendering, matched_type: string,
    used_default: bool) — rows no member parses get ``default`` with
    matched_type null, mirroring the reference's all-failed fallback.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    value = pa.array([None] * n, type=pa.string())
    matched = pa.array([None] * n, type=pa.string())
    remaining = pc.is_valid(col)  # rows still unmatched (and non-null)
    for t in targets:
        parsed, _ = coerce_column(col, t, default=NO_DEFAULT)
        hit = pc.and_(remaining, pc.is_valid(parsed))
        rendered = _render_string(parsed, t)
        value = pc.if_else(hit, rendered, value)
        matched = pc.if_else(hit, pa.scalar(t, type=pa.string()), matched)
        remaining = pc.and_(remaining, pc.invert(pc.is_valid(parsed)))
    used_default = remaining  # non-null input, no member matched
    if default is not None:
        value = pc.if_else(used_default, pa.scalar(str(default)), value)
    return value, matched, used_default


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
