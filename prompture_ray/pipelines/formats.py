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
