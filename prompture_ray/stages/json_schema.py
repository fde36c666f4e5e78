"""Nested JSON-Schema validation over JSON-string columns.

The Ray-Data-native analog of the reference's core validator entry point
``validate_against_schema(instance_json, schema)`` (reference:
prompture/extraction/validator.py:10-31 — ``json.loads`` then
``jsonschema.validate``), covering the vocabulary its conformance suite
exercises (reference specs/schema_validation.json: nested objects, arrays,
enum, minimum/maximum, required, ``["string","null"]`` unions) plus the
keywords the reference's schema *generator* emits
(prompture/extraction/tools.py:273-392: anyOf, prefixItems,
additionalProperties, nullable).

Design: the schema is COMPILED ONCE into a tree of closures (memoized per
serialized schema, so both stateless map_batches tasks and actor pools pay
compilation once per process), and each row pays only ``json.loads`` plus
the compiled walk — no per-row schema-dict traversal, no per-row
``jsonschema`` overhead. The installed ``jsonschema`` package is used as a
conformance oracle in tests, never in the hot path.

Semantics mirror jsonschema draft 2020-12 defaults:
- ``format`` is annotation-only (not validated), like jsonschema's default.
- ``"integer"`` accepts floats with zero fractional part (1.0 is valid).
- bool is NOT a number/integer, and enum/const comparisons are
  bool-vs-number strict (``True`` does not match ``1``).
- unknown keywords are ignored.
Extension: OpenAPI-style ``nullable: true`` (emitted by the reference's
create_field_schema) admits null at that node.

Errors are ``"<path>:<keyword>"`` strings with JSONPath-ish paths
(``$.address.street:required``), one per failing path — the per-path
violation rows the reference surfaces via ValidationError messages.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa

# list of errors appended to, path prefix -> None
_Check = Callable[[Any, str, list], None]

_TYPE_TESTS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "string": lambda v: isinstance(v, str),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: (isinstance(v, int) and not isinstance(v, bool))
    or (isinstance(v, float) and v.is_integer()),
}


def _strict_equal(a: Any, b: Any) -> bool:
    """== with bool-vs-number distinction (jsonschema enum semantics)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_strict_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_strict_equal(v, b[k]) for k, v in a.items())
    return a == b


def _compile_node(schema: Any) -> _Check:  # noqa: C901 - dispatch table
    """Compile one schema node into a closure list evaluated in order."""
    if schema is True or schema == {}:
        return lambda v, p, errs: None
    if schema is False:
        return lambda v, p, errs: errs.append(f"{p}:false_schema")
    if not isinstance(schema, dict):
        raise ValueError(f"unsupported schema node: {schema!r}")

    checks: list[_Check] = []

    nullable = bool(schema.get("nullable"))

    if "type" in schema:
        t = schema["type"]
        names = [t] if isinstance(t, str) else list(t)
        for n in names:
            if n not in _TYPE_TESTS:
                raise ValueError(f"unknown type {n!r}")
        tests = [_TYPE_TESTS[n] for n in names]
        if len(tests) == 1:
            t0 = tests[0]
            checks.append(lambda v, p, errs, _t=t0: None if _t(v)
                          else errs.append(f"{p}:type"))
        else:
            checks.append(lambda v, p, errs, _ts=tests: None
                          if any(t(v) for t in _ts)
                          else errs.append(f"{p}:type"))

    if "enum" in schema:
        allowed = list(schema["enum"])
        checks.append(lambda v, p, errs, _a=allowed: None
                      if any(_strict_equal(v, x) for x in _a)
                      else errs.append(f"{p}:enum"))
    if "const" in schema:
        cv = schema["const"]
        checks.append(lambda v, p, errs, _c=cv: None if _strict_equal(v, _c)
                      else errs.append(f"{p}:const"))

    # ---- numeric bounds (apply only to numbers, per spec) --------------
    def _num(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    if "minimum" in schema:
        lo = schema["minimum"]
        checks.append(lambda v, p, errs, _lo=lo: None
                      if not _num(v) or v >= _lo
                      else errs.append(f"{p}:minimum"))
    if "maximum" in schema:
        hi = schema["maximum"]
        checks.append(lambda v, p, errs, _hi=hi: None
                      if not _num(v) or v <= _hi
                      else errs.append(f"{p}:maximum"))
    if "exclusiveMinimum" in schema:
        lo = schema["exclusiveMinimum"]
        checks.append(lambda v, p, errs, _lo=lo: None
                      if not _num(v) or v > _lo
                      else errs.append(f"{p}:exclusiveMinimum"))
    if "exclusiveMaximum" in schema:
        hi = schema["exclusiveMaximum"]
        checks.append(lambda v, p, errs, _hi=hi: None
                      if not _num(v) or v < _hi
                      else errs.append(f"{p}:exclusiveMaximum"))
    if "multipleOf" in schema:
        m = schema["multipleOf"]
        checks.append(lambda v, p, errs, _m=m: None
                      if not _num(v) or (v / _m) == int(v / _m)
                      else errs.append(f"{p}:multipleOf"))

    # ---- string constraints (apply only to strings) --------------------
    if "minLength" in schema:
        n = schema["minLength"]
        checks.append(lambda v, p, errs, _n=n: None
                      if not isinstance(v, str) or len(v) >= _n
                      else errs.append(f"{p}:minLength"))
    if "maxLength" in schema:
        n = schema["maxLength"]
        checks.append(lambda v, p, errs, _n=n: None
                      if not isinstance(v, str) or len(v) <= _n
                      else errs.append(f"{p}:maxLength"))
    if "pattern" in schema:
        rx = re.compile(schema["pattern"])
        checks.append(lambda v, p, errs, _rx=rx: None
                      if not isinstance(v, str) or _rx.search(v)
                      else errs.append(f"{p}:pattern"))

    # ---- object keywords ----------------------------------------------
    if "required" in schema:
        req = list(schema["required"])
        def _required(v, p, errs, _req=req):
            if isinstance(v, dict):
                for k in _req:
                    if k not in v:
                        errs.append(f"{p}.{k}:required")
        checks.append(_required)

    props = {k: _compile_node(s) for k, s in schema.get("properties", {}).items()}
    addl = schema.get("additionalProperties", None)
    addl_check = None if addl in (None, True) else _compile_node(addl)
    addl_forbidden = addl is False
    if props or addl is not None:
        def _props(v, p, errs, _props=props, _addl=addl_check,
                   _forbid=addl_forbidden):
            if not isinstance(v, dict):
                return
            for k, val in v.items():
                sub = _props.get(k)
                if sub is not None:
                    sub(val, f"{p}.{k}", errs)
                elif _forbid:
                    errs.append(f"{p}.{k}:additionalProperties")
                elif _addl is not None:
                    _addl(val, f"{p}.{k}", errs)
        checks.append(_props)

    # ---- array keywords ------------------------------------------------
    if "minItems" in schema:
        n = schema["minItems"]
        checks.append(lambda v, p, errs, _n=n: None
                      if not isinstance(v, list) or len(v) >= _n
                      else errs.append(f"{p}:minItems"))
    if "maxItems" in schema:
        n = schema["maxItems"]
        checks.append(lambda v, p, errs, _n=n: None
                      if not isinstance(v, list) or len(v) <= _n
                      else errs.append(f"{p}:maxItems"))
    if "uniqueItems" in schema and schema["uniqueItems"]:
        def _uniq(v, p, errs):
            if isinstance(v, list):
                for i, a in enumerate(v):
                    for b in v[i + 1:]:
                        if _strict_equal(a, b):
                            errs.append(f"{p}:uniqueItems")
                            return
        checks.append(_uniq)

    prefix = [_compile_node(s) for s in schema.get("prefixItems", [])]
    items = schema.get("items", None)
    items_check = None if items in (None, True) else _compile_node(items)
    items_forbidden = items is False
    if prefix or items is not None:
        def _items(v, p, errs, _pre=prefix, _it=items_check,
                   _forbid=items_forbidden):
            if not isinstance(v, list):
                return
            for i, val in enumerate(v):
                if i < len(_pre):
                    _pre[i](val, f"{p}[{i}]", errs)
                elif _forbid:
                    errs.append(f"{p}[{i}]:items")
                elif _it is not None:
                    _it(val, f"{p}[{i}]", errs)
        checks.append(_items)

    # ---- combinators ---------------------------------------------------
    if "allOf" in schema:
        subs = [_compile_node(s) for s in schema["allOf"]]
        def _all(v, p, errs, _subs=subs):
            for s in _subs:
                s(v, p, errs)
        checks.append(_all)
    if "anyOf" in schema:
        subs = [_compile_node(s) for s in schema["anyOf"]]
        def _any(v, p, errs, _subs=subs):
            for s in _subs:
                sub_errs: list = []
                s(v, p, sub_errs)
                if not sub_errs:
                    return
            errs.append(f"{p}:anyOf")
        checks.append(_any)
    if "oneOf" in schema:
        subs = [_compile_node(s) for s in schema["oneOf"]]
        def _one(v, p, errs, _subs=subs):
            n_ok = 0
            for s in _subs:
                sub_errs: list = []
                s(v, p, sub_errs)
                if not sub_errs:
                    n_ok += 1
            if n_ok != 1:
                errs.append(f"{p}:oneOf")
        checks.append(_one)
    if "not" in schema:
        sub = _compile_node(schema["not"])
        def _not(v, p, errs, _sub=sub):
            sub_errs: list = []
            _sub(v, p, sub_errs)
            if not sub_errs:
                errs.append(f"{p}:not")
        checks.append(_not)

    def node(v, p, errs, _checks=checks, _nullable=nullable):
        if v is None and _nullable:
            return
        for c in _checks:
            c(v, p, errs)

    return node


_COMPILE_CACHE: dict[str, Callable[[Any], list[str]]] = {}


def compile_schema(schema: dict) -> Callable[[Any], list[str]]:
    """Compile ``schema`` → ``validate(parsed_value) -> [error, ...]``.
    Memoized per serialized schema (once per process, shared by every
    batch a task/actor processes)."""
    key = json.dumps(schema, sort_keys=True, default=str)
    fn = _COMPILE_CACHE.get(key)
    if fn is None:
        node = _compile_node(schema)

        def fn(value: Any) -> list[str]:
            errs: list[str] = []
            node(value, "$", errs)
            return errs

        _COMPILE_CACHE[key] = fn
    return fn


def validate_json_strings(arr, schema: dict,
                          max_errors_per_row: int = 16
                          ) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Validate a string column of JSON documents against ``schema``.

    Returns ``(ok: bool[], n_errors: int64[], first_error: string[])`` —
    null input rows yield (null, null, null); unparseable JSON yields
    (False, 1, "$:invalid_json"), mirroring the reference's
    ``{"ok": False, "error": "invalid_json: ..."}`` return
    (validator.py:24-27).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    validate = compile_schema(schema)
    n = len(arr)
    ok = np.zeros(n, dtype=bool)
    nerr = np.zeros(n, dtype=np.int64)
    first: list = [None] * n
    null_mask = np.zeros(n, dtype=bool)
    loads = json.loads
    for i, s in enumerate(arr.to_pylist()):
        if s is None:
            null_mask[i] = True
            continue
        try:
            data = loads(s)
        except (ValueError, TypeError):
            nerr[i] = 1
            first[i] = "$:invalid_json"
            continue
        errs = validate(data)
        if errs:
            nerr[i] = min(len(errs), max_errors_per_row)
            first[i] = errs[0]
        else:
            ok[i] = True
    ok_arr = pa.array(ok, type=pa.bool_())
    nerr_arr = pa.array(nerr, type=pa.int64())
    if null_mask.any():
        nm = pa.array(~null_mask, type=pa.bool_())
        import pyarrow.compute as pc
        ok_arr = pc.if_else(nm, ok_arr, pa.scalar(None, pa.bool_()))
        nerr_arr = pc.if_else(nm, nerr_arr, pa.scalar(None, pa.int64()))
    return ok_arr, nerr_arr, pa.array(first, type=pa.string())


def json_schema_errors(arr, schema: dict) -> list[tuple[int, str]]:
    """All (row_index, error) pairs for a string column — the per-failing-
    path expansion used for violation rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    validate = compile_schema(schema)
    out: list[tuple[int, str]] = []
    for i, s in enumerate(arr.to_pylist()):
        if s is None:
            continue
        try:
            data = json.loads(s)
        except (ValueError, TypeError):
            out.append((i, "$:invalid_json"))
            continue
        for e in validate(data):
            out.append((i, e))
    return out


def json_schema_verdicts(ds, col: str, schema: dict,
                         id_cols: tuple[str, ...] = (),
                         batch_size: int | None = 8192):
    """Dataset → (id_cols..., ok, n_errors, first_error) via one
    map_batches pass (schema compiled once per worker process)."""

    def fn(t: pa.Table) -> pa.Table:
        from prompture_ray.functions import limit_arrow_threads
        limit_arrow_threads(1)
        ok, nerr, first = validate_json_strings(t[col], schema)
        cols = {c: t[c] for c in id_cols}
        cols.update({"ok": ok, "n_errors": nerr, "first_error": first})
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
