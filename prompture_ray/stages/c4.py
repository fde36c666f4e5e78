"""C4-style line and page filtering (Raffel et al. 2020 §2.2 — the
cleaning recipe behind the C4 corpus; beyond the reference, whose text
filters are whole-document shape checks only, cf.
reference prompture/dataset/filters.py analog in stages/textstats.py).

Rules, applied per document with NO shuffle anywhere (every check is
local to the row, vectorized over the batch's flattened lines):

line level — a line is KEPT iff
  * it ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``),
  * it has at least ``min_words`` whitespace-delimited words,
  * it does not contain the word ``javascript`` (case-insensitive);

page level — a document is KEPT iff
  * it retains at least ``min_lines`` lines after line filtering,
  * its RAW text contains neither a curly bracket ``{`` nor the phrase
    ``lorem ipsum`` (case-insensitive).

Returns one row per input document: the input columns (pass-through —
the op composes in pipelines) with ``text_col`` replaced by the kept
lines rejoined with ``sep`` (empty string when no line survives), plus
``n_lines_kept`` and ``page_kept``. Callers wanting C4's destructive
behaviour filter on ``page_kept`` afterwards; keeping every row makes
the op auditable and the oracle row-count stable.

Scale shape: a single ``map_batches`` pass — line split / regex checks /
rebuild are all Arrow kernels over the flattened line array
(``pc.split_pattern`` → boolean masks → ``ListArray`` offsets +
``pc.binary_join``), the same zero-shuffle rebuild used by
``line_dedup`` (stages/dedup.py). Nothing leaves the batch.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TERMINAL_RE = r'[.!?"]$'
_WORD_RE = r"\S+"


def c4_line_filter(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 5, min_lines: int = 3,
                   sep: str = "\n"):
    """Apply the C4 cleaning rules (module docstring) to ``ds``."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        toks = pc.split_pattern(arr, pattern=sep)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()

        if len(flat):
            ends_ok = pc.match_substring_regex(flat, _TERMINAL_RE)
            words_ok = pc.greater_equal(
                pc.count_substring_regex(flat, _WORD_RE), min_words)
            no_js = pc.invert(pc.match_substring(
                pc.utf8_lower(flat), "javascript"))
            keep = pc.and_(pc.and_(ends_ok, words_ok), no_js) \
                .to_numpy(zero_copy_only=False).astype(bool)
        else:
            keep = np.zeros(0, dtype=bool)

        doc_idx = np.repeat(np.arange(len(lens)), lens)
        kept_counts = np.bincount(
            doc_idx[keep], minlength=len(lens)).astype(np.int64)

        raw_lower = pc.utf8_lower(arr)
        clean_page = pc.and_(
            pc.invert(pc.match_substring(raw_lower, "{")),
            pc.invert(pc.match_substring(raw_lower, "lorem ipsum"))) \
            .to_numpy(zero_copy_only=False).astype(bool)
        page_kept = clean_page & (kept_counts >= min_lines)

        offsets = np.concatenate(
            ([0], np.cumsum(kept_counts))).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            flat.filter(pa.array(keep)) if len(flat)
            else pa.array([], type=pa.string()))
        # replace the text column in place and append the flags —
        # pass-through columns survive so the op composes in pipelines
        t = t.set_column(t.schema.get_field_index(text_col), text_col,
                         pc.binary_join(lst, sep))
        t = t.append_column("n_lines_kept",
                            pa.array(kept_counts, type=pa.int64()))
        return t.append_column("page_kept",
                               pa.array(page_kept, type=pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")
