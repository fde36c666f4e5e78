"""Encoding hygiene for web text: Unicode NFC normalization and
mojibake repair (the ftfy step of crawl cleaning; beyond the
reference, whose normalizer only lowercases/strips — see
prompture/utils/normalize.py).

Scale shape: both passes are map_batches with VECTORIZED detection —
the Arrow regex kernel flags candidate rows (mojibake byte-pair
pattern) or the C-level ``unicodedata.is_normalized`` quick check
(already-NFC strings, the overwhelming majority, never re-normalize) —
and only flagged rows take the per-string repair path. Nothing
shuffles; nothing is stateful.

Mojibake repair = the classic double-encoding inverse: a string whose
UTF-8 bytes were mis-decoded as Latin-1/cp1252 is re-encoded with that
codec and re-decoded as UTF-8 (ftfy's core trick). Repair is attempted
with latin-1 first, then cp1252 (curly quotes land in 0x80–0x9F, which
latin-1 cannot re-encode); strings that fail both round-trips are left
untouched — the repair is conservative and idempotent on clean text.
"""
from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a UTF-8 lead byte (C2–F4) mis-decoded as Latin-1, followed by a
# mis-decoded continuation byte: latin-1 keeps 80–BF as-is, cp1252 maps
# 80–9F into punctuation (€…™ block) — either tail is the signature
_MOJI_PATTERN = "[\u00c2-\u00f4][\u0080-\u00bf\u20ac-\u2122]"


def fix_mojibake_value(s: str) -> str:
    """Repair one string (exposed for tests/oracles)."""
    for enc in ("latin-1", "cp1252"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            continue
    return s


def clean_text(ds, text_col: str, nfc: bool = True,
               mojibake: bool = True, out_col: str | None = None):
    """NFC-normalize and/or repair mojibake in ``text_col``. Adds
    ``<out_col>`` (default: replaces ``text_col``) plus boolean audit
    columns ``moji_fixed`` / ``nfc_changed``."""
    target = out_col or text_col

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        vals = np.asarray(arr.to_pylist(), dtype=object)
        n = len(vals)
        moji_fixed = np.zeros(n, dtype=bool)
        nfc_changed = np.zeros(n, dtype=bool)

        if mojibake and n:
            cand = pc.match_substring_regex(arr, _MOJI_PATTERN) \
                .to_numpy(zero_copy_only=False)
            for i in np.nonzero(cand)[0]:
                fixed = fix_mojibake_value(vals[i])
                if fixed != vals[i]:
                    vals[i] = fixed
                    moji_fixed[i] = True

        if nfc and n:
            # ASCII is always NFC — vectorized pre-filter, then the
            # C-level quick check; only genuinely unnormalized rows pay
            nonascii = pc.match_substring_regex(
                pa.array(vals, type=pa.string()), r"[^\x00-\x7F]") \
                .to_numpy(zero_copy_only=False)
            for i in np.nonzero(nonascii)[0]:
                s = vals[i]
                if not unicodedata.is_normalized("NFC", s):
                    vals[i] = unicodedata.normalize("NFC", s)
                    nfc_changed[i] = True

        out = t
        new = pa.array(vals, type=pa.string())
        if target in out.column_names:
            out = out.set_column(out.column_names.index(target),
                                 target, new)
        else:
            out = out.append_column(target, new)
        out = out.append_column("moji_fixed", pa.array(moji_fixed))
        return out.append_column("nfc_changed", pa.array(nfc_changed))

    return ds.map_batches(fn, batch_format="pyarrow")
