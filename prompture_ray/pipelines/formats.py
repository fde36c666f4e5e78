"""Dataset output formats: JSONL / ShareGPT / Alpaca projections + sinks.

Reference semantics (prompture/dataset/formats.py):
- ``to_jsonl``: one JSON object per record, ensure_ascii=False
  (formats.py:71-88 ``write_dataset``)
- ``to_sharegpt``: {"conversations": [{"from": "human", "value": q},
  {"from": "gpt", "value": a}]} (formats.py:26-68)
- ``to_alpaca``: {"instruction", "input", "output"}

Projections run as vectorized ``map_batches``; the sink is partitioned
(``write_json`` → a directory of part files, resumable layout).
"""

from __future__ import annotations

import json

import pyarrow as pa


def to_jsonl_column(ds, cols: list[str] | None = None,
                    out_col: str = "json"):
    """Serialize each row to a canonical JSON string column
    (sort_keys for determinism, ensure_ascii=False like the reference)."""

    def fn(t: pa.Table) -> pa.Table:
        use = cols or t.column_names
        rows = t.select(use).to_pylist()
        out = [json.dumps(r, ensure_ascii=False, sort_keys=True, default=str)
               for r in rows]
        return t.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def to_sharegpt(ds, q_col: str, a_col: str):
    def fn(t: pa.Table) -> pa.Table:
        qs = t[q_col].to_pylist()
        ans = t[a_col].to_pylist()
        recs = [json.dumps({"conversations": [
            {"from": "human", "value": q},
            {"from": "gpt", "value": a},
        ]}, ensure_ascii=False, sort_keys=True) for q, a in zip(qs, ans)]
        return pa.table({"sharegpt": pa.array(recs, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def to_alpaca(ds, instruction_col: str, output_col: str,
              input_col: str | None = None):
    def fn(t: pa.Table) -> pa.Table:
        ins = t[instruction_col].to_pylist()
        outs = t[output_col].to_pylist()
        inps = t[input_col].to_pylist() if input_col else [""] * len(ins)
        recs = [json.dumps({"instruction": i, "input": x, "output": o},
                           ensure_ascii=False, sort_keys=True)
                for i, x, o in zip(ins, inps, outs)]
        return pa.table({"alpaca": pa.array(recs, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def write_jsonl(ds, out_dir: str, col: str = "json") -> None:
    """Partitioned JSONL sink (directory of part files — resumable
    layout, never one giant file)."""
    ds.select_columns([col]).write_json(out_dir)


# ---------------------------------------------------------------------------
# TOON (Token-Oriented Object Notation) tabular projection
# (reference _dataframe_to_toon, extraction/core.py:1909 — the reference
# delegates to the python-toon package; this is an independent
# implementation of the public TOON spec's uniform-array tabular form:
# header "[N]{f1,f2}:" then one indented comma-row per record)
# ---------------------------------------------------------------------------

_TOON_BARE_RE = None


def _toon_scalar(v) -> str:
    """One TOON cell: numbers/bools/null bare; strings bare unless they
    contain structural characters, look like another scalar type, or have
    leading/trailing whitespace — then JSON-style double quotes."""
    import re
    global _TOON_BARE_RE
    if _TOON_BARE_RE is None:
        _TOON_BARE_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return "null"                      # TOON has no NaN/Inf
        return repr(v)                         # shortest round-trip form
    if isinstance(v, int):
        return str(v)
    s = str(v)
    needs_quote = (
        s == "" or s != s.strip()
        or any(c in s for c in ',:"{}[]\n\t')
        or s in ("true", "false", "null")
        or _TOON_BARE_RE.match(s) is not None)
    if needs_quote:
        return json.dumps(s, ensure_ascii=False)
    return s


def toon_encode_table(t: pa.Table, key: str | None = None,
                      indent: int = 2) -> str:
    """Encode one Arrow table (uniform records) as a TOON block. With
    ``key`` the block is named (``key[N]{...}:``), else it is a root
    array (``[N]{...}:``)."""
    if t.num_rows == 0:
        raise ValueError("TOON tabular form needs at least one row")
    fields = list(t.column_names)
    head = f"{key or ''}[{t.num_rows}]{{{','.join(fields)}}}:"
    pad = " " * indent
    cols = [t[f].to_pylist() for f in fields]
    lines = [head]
    for i in range(t.num_rows):
        lines.append(pad + ",".join(_toon_scalar(c[i]) for c in cols))
    return "\n".join(lines)


def to_toon(ds, cols: list[str] | None = None, key: str | None = None):
    """Distributed TOON projection: ONE toon block column per Ray block
    (a block is the natural shard — a 100-TB dataset becomes a directory
    of TOON shards, never one giant driver-side string). For the
    reference's whole-DataFrame string on small data, concatenate:
    ``"\\n".join(b["toon"][0].as_py() for b in out.iter_batches(...))``."""

    def fn(t: pa.Table) -> pa.Table:
        use = t.select(cols) if cols else t
        return pa.table({"toon": pa.array([toon_encode_table(use, key)],
                                          type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def toon_decode(s: str) -> tuple[str | None, list[dict]]:
    """Decode a TOON tabular block back to (key, records) — the inverse
    of ``toon_encode_table`` for round-trip testing."""
    import re
    lines = s.split("\n")
    m = re.match(r"^(?P<key>[^\[\]{}:,]*)\[(?P<n>\d+)\]"
                 r"\{(?P<fields>[^}]*)\}:$", lines[0])
    if not m:
        raise ValueError("not a TOON tabular block")
    key = m.group("key") or None
    fields = m.group("fields").split(",")
    n = int(m.group("n"))

    num_re = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")

    def coerce(v: str):
        if v == "null":
            return None
        if v == "true":
            return True
        if v == "false":
            return False
        if num_re.match(v):
            return float(v) if any(ch in v for ch in ".eE") else int(v)
        return v

    recs = []
    for line in lines[1:n + 1]:
        cells = _cells_with_quote_flags(line.strip())
        recs.append({f: (cell if was_quoted else coerce(cell))
                     for f, (cell, was_quoted) in zip(fields, cells)})
    return key, recs


def _cells_with_quote_flags(line: str) -> list[tuple]:
    """Split a TOON row into (value, was_quoted) cells."""
    out, i = [], 0
    while i <= len(line):
        if i == len(line):
            out.append(("", False))
            break
        if line[i] == '"':
            j, esc = i + 1, False
            while j < len(line):
                if esc:
                    esc = False
                elif line[j] == "\\":
                    esc = True
                elif line[j] == '"':
                    break
                j += 1
            out.append((json.loads(line[i:j + 1]), True))
            i = j + 1
            if i < len(line) and line[i] == ",":
                i += 1
            elif i >= len(line):
                break
            continue
        j = line.find(",", i)
        if j == -1:
            out.append((line[i:], False))
            break
        out.append((line[i:j], False))
        i = j + 1
    return out
