"""User-extension surface: custom check kinds, template substitution,
few-shot selection, source helpers."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from prompture_ray.specs import (
    CheckSpec, Suite, register_check_kind, reset_check_registry,
    substitute_templates, load_suite,
)
from prompture_ray.stages.validate import ValidateBatch


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    reset_check_registry()


def test_custom_check_kind():
    def even_kernel(check, batch):
        return pc.equal(pc.bit_wise_and(batch[check.column], 1), 0)

    register_check_kind("even", even_kernel)
    suite = Suite.from_dict({"meta": {}, "checks": [
        {"id": "n-even", "column": "n", "kind": "even"}]})
    t = pa.table({"n": [2, 3, 4], "url": ["a", "b", "c"]})
    out = ValidateBatch(suite, key_col="url")(t)
    assert out["ok"].to_pylist() == [True, False, True]
    assert out["reason"].to_pylist()[1] == "even:n"


def test_custom_kind_cannot_shadow_builtin():
    with pytest.raises(ValueError):
        register_check_kind("regex", lambda c, b: None)


def test_unknown_kind_still_rejected():
    with pytest.raises(Exception):
        CheckSpec(id="x", column="c", kind="nope")


def test_template_substitution(tmp_path):
    raw = {"meta": {"suite": "s"}, "checks": [
        {"id": "t", "column": "warc_ts", "kind": "range",
         "max": "{{current_date}}T00:00:00"}]}
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(raw))
    suite = load_suite(p)
    assert suite.check("t").max == "2026-08-17T00:00:00"
    assert substitute_templates("{{current_year}}-x",
                                {"current_year": 1999}) == "1999-x"


def test_ngram_embed_and_fewshot(ray_session):
    import ray.data as rd
    from prompture_ray.functions.ngram_embed import ngram_embed, FewShotSelector

    ex = ["the quick brown fox", "distributed data systems",
          "cooking pasta recipes"]
    store = FewShotSelector.build_store(ex, example_ids=[10, 20, 30])
    ds = rd.from_arrow(pa.table({
        "text": ["quick brown foxes run", "ray data distributed engine"]}))
    out = ds.map_batches(FewShotSelector(store, "text", k=2),
                         batch_format="pyarrow").to_pandas()
    assert out["fewshot_ids"].iloc[0][0] == 10   # fox text → fox example
    assert out["fewshot_ids"].iloc[1][0] == 20   # distributed → systems
    m = ngram_embed(ex)
    assert m.shape == (3, 256)
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-5)


def test_read_html_files(ray_session, tmp_path):
    from prompture_ray.sources import read_html_files
    f = tmp_path / "page.html"
    f.write_bytes(b"<html><head><title>T1</title></head>"
                  b"<body><nav>menu</nav><p>real content</p></body></html>")
    out = read_html_files([str(f)]).to_pandas()
    assert len(out) == 1
    assert out["title"].iloc[0] == "T1"
    assert "real content" in out["text"].iloc[0]
    assert "menu" not in out["text"].iloc[0]


def test_read_webpages_blocks(ray_session, webpages_small):
    from prompture_ray.sources import read_webpages
    ds = read_webpages(webpages_small / "pages", columns=["url"])
    assert ds.count() == 3000
    with pytest.raises(FileNotFoundError):
        read_webpages("/tmp/definitely_missing_dir_xyz")
