"""compression_signals (stages/textstats.py) + the pinned literals the
compression_ratio_docs oracle carries."""

import zlib

import numpy as np
import pandas as pd


def test_pinned_comp_sizes_match_zlib():
    """Non-circular derivation of the SQL CASE literals: recompute the
    (orig, comp) pairs from zlib itself."""
    from prompture_ray.pipelines.queries import (_COMP_SIZES,
                                                 _COMP_VARIANTS)
    for text, (orig, comp) in zip(_COMP_VARIANTS, _COMP_SIZES):
        assert len(text.encode("utf-8")) == orig
        assert len(zlib.compress(text.encode("utf-8"), 6)) == comp


def test_compression_signals(ray_session):
    import ray.data as rd
    from prompture_ray.stages.textstats import compression_signals

    df = pd.DataFrame({"text": ["spam spam spam spam spam spam spam",
                                "zq9 xk2 vb7 mc4 ht6 rj8 wn1 pl3 gd5",
                                "", None]})
    out = compression_signals(rd.from_pandas(df)).to_pandas()
    # repetitive text compresses better than high-entropy text
    assert out["comp_ratio"][0] < out["comp_ratio"][1]
    assert out["orig_len"].tolist()[:2] == [34, 35]
    assert np.isnan(out["comp_ratio"][2]) and np.isnan(out["comp_ratio"][3])
    assert out["orig_len"][2] == 0 and out["orig_len"][3] == 0
    # exact division invariant
    assert out["comp_ratio"][0] == out["comp_len"][0] / out["orig_len"][0]
