"""Composed crawl-curation pipeline (the CCNet/C4 recipe end-to-end;
beyond the reference, which validates single records): encoding
hygiene → language ID → heuristic quality filter → LM perplexity
bucket → first-wins exact dedup → one keep verdict per document, with
every gate's decision kept as an audit column.

Composition is pure Dataset-to-Dataset: four fused map stages and the
ONE sort shuffle the dedup flag needs — the stream never materializes.
Every stage is an existing operator (stages/textclean.py,
textstats.LangIdStage, textstats.add_quality_score, lm.lm_score in
append mode, dedup.dedup_exact in flag mode); this module only wires
them, so each gate's semantics stay independently oracle-checked.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def curate_corpus(ds, text_col: str, id_col: str, lm_model,
                  allowed_langs: tuple = ("en",),
                  ppl_buckets: tuple[float, float] = (11.0, 16.0),
                  drop_bucket: str = "tail"):
    """Audit rows: original columns + ``moji_fixed / nfc_changed /
    lang_pred / lang_conf / keep / drop_reason / n_tokens / logprob /
    ppl / bucket / is_first / lang_ok / verdict``.

    ``verdict`` = lang_ok AND quality keep AND bucket != drop_bucket
    AND is_first. The dedup flag is computed over ALL documents (the
    C4 order: dedup is content-keyed, not gated on the other filters).
    The LM is a broadcast model trained on a REFERENCE corpus
    (``lm.train_bigram_lm``) — the CCNet convention, where the target
    domain defines 'head'."""
    from prompture_ray.stages.textclean import clean_text
    from prompture_ray.stages.textstats import (LangIdStage,
                                                add_quality_score)
    from prompture_ray.stages.lm import lm_score
    from prompture_ray.stages.dedup import dedup_exact

    out = clean_text(ds, text_col)
    out = out.map_batches(LangIdStage(text_col), batch_format="pyarrow")
    out = add_quality_score(out, text_col)
    out = lm_score(out, lm_model, text_col, id_col,
                   buckets=ppl_buckets, append=True)
    out = dedup_exact(out, text_col, id_col, normalize=True,
                      flag_col="is_first")
    allowed = set(allowed_langs)

    def verdict(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang_pred"].to_pylist(), dtype=object)
        lang_ok = np.array([x in allowed for x in lang], dtype=bool)
        q = t["keep"].to_numpy(zero_copy_only=False).astype(bool)
        bucket = np.asarray(t["bucket"].to_pylist(), dtype=object)
        nb = np.array([b is not None and b != drop_bucket
                       for b in bucket], dtype=bool)
        first = t["is_first"].to_numpy(zero_copy_only=False).astype(bool)
        v = lang_ok & q & nb & first
        return t.append_column("lang_ok", pa.array(lang_ok)) \
                .append_column("verdict", pa.array(v))

    return out.map_batches(verdict, batch_format="pyarrow")
