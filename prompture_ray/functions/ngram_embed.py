"""Char-trigram hashed embeddings + few-shot example selection.

Reference: ``_NgramEmbedder`` (prompture/extraction/few_shot.py:52-75 —
char-trigram hashing into a fixed-dim vector, L2-normalized) and
``FewShotExampleStore.select`` (few_shot.py:199-241 — top-k by cosine
against a cached example matrix).

Distributed form: the example store is a broadcast matrix (``ray.put``
once); per-batch scoring is one numpy matmul — the same pattern as
``stages/similarity.knn_brute_force`` with the roles reversed (small
example set, big query stream).
"""

from __future__ import annotations

import numpy as np

from prompture_ray.functions.sketches import hash64


def ngram_embed(texts, dim: int = 256, n: int = 3) -> np.ndarray:
    """(len(texts), dim) float32 — hashed char-n-gram counts, L2-normed."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        s = t.lower()
        grams = [s[j:j + n] for j in range(max(1, len(s) - n + 1))]
        idx = hash64(np.asarray(grams, dtype=object)) % np.uint64(dim)
        np.add.at(out[i], idx.astype(np.int64), 1.0)
        norm = np.linalg.norm(out[i])
        if norm:
            out[i] /= norm
    return out


class FewShotSelector:
    """Actor-pool stage: for each row's text, the top-k most similar
    example ids from a broadcast example store."""

    def __init__(self, examples_ref, text_col: str = "text", k: int = 3,
                 dim: int = 256):
        # examples_ref: ray ObjectRef of (ids list, matrix) or the tuple
        self._ref = examples_ref
        self.text_col = text_col
        self.k = k
        self.dim = dim
        self._store = None

    @staticmethod
    def build_store(example_texts: list[str], example_ids=None,
                    dim: int = 256):
        """Driver-side: embed examples once, ``ray.put`` the store."""
        import ray
        ids = list(example_ids) if example_ids is not None \
            else list(range(len(example_texts)))
        mat = ngram_embed(example_texts, dim=dim)
        return ray.put((ids, mat))

    def __call__(self, batch):
        import pyarrow as pa
        import ray
        if self._store is None:
            self._store = ray.get(self._ref) \
                if not isinstance(self._ref, tuple) else self._ref
        ids, mat = self._store
        texts = batch[self.text_col].to_pylist()
        q = ngram_embed(texts, dim=self.dim)
        sims = q @ mat.T
        k = min(self.k, sims.shape[1])
        sel = []
        for row in sims:
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) \
                else np.arange(len(row))
            order = top[np.lexsort((np.asarray(ids, dtype=object)[top],
                                    -row[top]))]
            sel.append([ids[j] for j in order])
        return batch.append_column(
            "fewshot_ids", pa.array(sel, type=pa.list_(pa.int64())))
