"""Emit-on-change streaming snapshots — the distributed form of the
reference's ``stream_extract`` (prompture/extraction/streaming.py:215-306):
accumulate delta text per stream, re-parse the partial JSON after every
delta, and emit a snapshot row ONLY when the parsed-and-filtered snapshot
changes; on stream end, emit one final strictly-parsed row when the full
buffer is valid JSON.

Ray-Data shape: the input is an ordered delta table
``(stream_id, seq, delta)``; each stream's replay is inherently
sequential, so one ``groupby(stream_id).map_groups`` holds exactly one
stream per group. Group size is bounded by a single response's delta
count (a stream is one LLM response — thousands of deltas, not billions),
so no hot-key bucketing is needed; the partition note the brief asks for:
co-locate by stream_id, never by time.
"""

from __future__ import annotations

import json

import pandas as pd

from prompture_ray.functions.textfuncs import parse_partial_json


def _snapshot(parsed, fields) -> dict | None:
    """Filtered snapshot of a partial parse (the ``_build_partial_model``
    + ``_dump`` analogue): keep only dict parses, optionally only the
    declared fields."""
    if not isinstance(parsed, dict):
        return None
    if fields is not None:
        return {k: parsed[k] for k in fields if k in parsed}
    return dict(parsed)


def replay_stream(deltas: list, fields=None, emit_unchanged: bool = False):
    """Replay one stream's ordered deltas → list of
    ``(seq, snapshot_json, is_final)`` tuples. Pure function — unit-testable
    without Ray, shared by the operator and tests."""
    buf = ""
    last = None
    out = []
    seq = None
    for seq, delta in deltas:
        buf += delta or ""
        snap = _snapshot(parse_partial_json(buf), fields)
        if snap is None or not snap:
            continue
        sj = json.dumps(snap, sort_keys=True, ensure_ascii=False)
        if not emit_unchanged and sj == last:
            continue
        last = sj
        out.append((seq, sj, False))
    # 'done' semantics: a full strict parse emits one validated final row
    # (reference streaming.py:292-302), regardless of change
    if seq is not None:
        try:
            final = json.loads(buf)
        except json.JSONDecodeError:
            final = None
        if isinstance(final, dict):
            out.append((seq, json.dumps(final, sort_keys=True,
                                        ensure_ascii=False), True))
    return out


def stream_snapshots(ds, stream_col: str, seq_col: str, delta_col: str,
                     fields=None, emit_unchanged: bool = False):
    """Emit-on-change snapshot stream over an ordered delta table.

    Returns a Dataset ``(stream_col, seq, snapshot, is_final)`` with one
    row per snapshot CHANGE (plus one final strict row per fully-valid
    stream). ``fields`` optionally restricts the snapshot to the declared
    field names (the Pydantic-model filter in the reference).
    """
    fields_t = tuple(fields) if fields is not None else None

    def per_stream(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col, kind="mergesort")
        rows = replay_stream(list(zip(g[seq_col], g[delta_col])),
                             fields_t, emit_unchanged)
        sid = g[stream_col].iloc[0]
        return pd.DataFrame({
            stream_col: [sid] * len(rows),
            "seq": [int(r[0]) for r in rows],
            "snapshot": [r[1] for r in rows],
            "is_final": [bool(r[2]) for r in rows],
        })

    return ds.groupby(stream_col).map_groups(per_stream,
                                             batch_format="pandas")
