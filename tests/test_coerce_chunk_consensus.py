"""Coercion-with-default, chunking, consensus, output formats."""

import json

import numpy as np
import pyarrow as pa
import pytest

from prompture_ray.stages import chunk as ch
from prompture_ray.stages.coerce import coerce_column, coerce_batch_fn


# ---------------------------------------------------------------------------
# coercion (reference tools.py:409-748 semantics)
# ---------------------------------------------------------------------------

def test_coerce_int_with_default():
    col = pa.array(["42", "3.7", "junk", None, " 1,200 "])
    vals, used = coerce_column(col, "int64", default=-1)
    assert vals.to_pylist() == [42, 4, -1, None, 1200]
    assert used.to_pylist() == [False, False, True, False, False]


def test_coerce_float_shorthand():
    col = pa.array(["$1,200", "1.2k", "12%", "nope"])
    vals, used = coerce_column(col, "float64", default=0.0, shorthand=True)
    assert vals.to_pylist() == [1200.0, 1200.0, 0.12, 0.0]
    assert used.to_pylist() == [False, False, False, True]


def test_coerce_bool_multilingual():
    col = pa.array(["si", "NO", "garbage", None])
    vals, used = coerce_column(col, "bool", default=False)
    assert vals.to_pylist() == [True, False, False, None]
    assert used.to_pylist() == [False, False, True, False]


def test_coerce_valid_mask_extraction_miss():
    """valid_mask: an extraction miss over a PRESENT source row counts as
    a failed parse (default + flag); a null source row stays null."""
    # extracted values: row0 hit, row1 miss-on-present-source, row2 null src
    extracted = pa.array(["7", None, None])
    src_valid = pa.array([True, True, False])
    vals, used = coerce_column(extracted, "int64", default=-1,
                               valid_mask=src_valid)
    assert vals.to_pylist() == [7, -1, None]
    assert used.to_pylist() == [False, True, False]


def test_coerce_timestamp():
    col = pa.array(["2024-01-01T00:00:00", "bad"])
    vals, used = coerce_column(col, "timestamp")
    assert vals.to_pylist()[0].year == 2024
    assert used.to_pylist() == [False, True]


def test_coerce_date_and_uuid():
    import datetime as dt
    vals, used = coerce_column(pa.array(["2024-02-29", "2024-02-30",
                                         "2024-01-02T10:00:00"]), "date")
    assert vals.to_pylist() == [dt.date(2024, 2, 29), None,
                                dt.date(2024, 1, 2)]
    assert used.to_pylist() == [False, True, False]
    vals, used = coerce_column(pa.array(
        ["A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11",
         "a0eebc999c0b4ef8bb6d6bb9bd380a11", "junk"]), "uuid")
    assert vals.to_pylist()[:2] == [
        "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"] * 2
    assert used.to_pylist() == [False, False, True]


def test_coerce_list_column():
    from prompture_ray.stages.coerce import coerce_list_column
    col = pa.array(["1,2,x", '["4","5"]', None, "7", ""])
    vals, used = coerce_list_column(col, "int64", item_default=-1)
    assert vals.to_pylist() == [[1, 2, -1], [4, 5], None, [7], []]
    assert used.to_pylist() == [True, False, False, False, False]


def test_coerce_dict_column():
    from prompture_ray.stages.coerce import coerce_dict_column
    col = pa.array(['{"b":1,"a":2}', "[1]", "junk", None])
    vals, used = coerce_dict_column(col)
    assert vals.to_pylist() == ['{"a":2,"b":1}', None, None, None]
    assert used.to_pylist() == [False, True, True, False]


def test_coerce_union_in_order():
    from prompture_ray.stages.coerce import coerce_union_column
    col = pa.array(["42", "2024-01-02T03:04:05", "hello", None])
    v, m, u = coerce_union_column(col, ("int64", "timestamp", "string"))
    assert v.to_pylist() == ["42", "2024-01-02T03:04:05", "hello", None]
    assert m.to_pylist() == ["int64", "timestamp", "string", None]
    assert u.to_pylist() == [False, False, False, False]
    # all members fail → default + flag (reference all-failed fallback)
    v, m, u = coerce_union_column(pa.array(["zz"]), ("int64", "timestamp"),
                                  default=-1)
    assert v.to_pylist() == ["-1"] and m.to_pylist() == [None]
    assert u.to_pylist() == [True]


def test_coerce_batch_fn(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"x": ["1", "oops"], "y": ["yes", "no"]}))
    out = ds.map_batches(coerce_batch_fn({
        "x": {"target": "int64", "default": 9},
        "y": {"target": "bool"},
    }), batch_format="pyarrow").to_pandas()
    assert out["x__coerced"].tolist() == [1, 9]
    assert out["x__used_default"].tolist() == [False, True]
    assert out["y__coerced"].tolist() == [True, False]


# ---------------------------------------------------------------------------
# chunking (reference chunkers semantics)
# ---------------------------------------------------------------------------

def test_chunk_fixed_overlap():
    chunks = ch.chunk_fixed("abcdefghij", size=4, overlap=1)
    assert chunks == ["abcd", "defg", "ghij", "j"]
    assert ch.chunk_fixed("", 4) == []


def test_chunk_recursive_respects_paragraphs():
    text = "para one here\n\npara two is a bit longer\n\nshort"
    chunks = ch.chunk_recursive(text, size=25, overlap=0)
    assert all(len(c) <= 25 for c in chunks)
    assert "para one here" in chunks[0]
    # every non-separator character survives
    assert "".join(chunks).replace("\n", " ").count("para") == 2


def test_chunk_tokens():
    text = " ".join(f"w{i}" for i in range(10))
    chunks = ch.chunk_tokens(text, n_tokens=4, overlap=1)
    assert chunks[0] == "w0 w1 w2 w3"
    assert chunks[1].startswith("w3")


def test_chunk_documents_and_merge(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["aaaa bbbb cccc dddd", "xx"],
    }))
    chunks = ch.chunk_documents(ds, "text", "doc_id", strategy="fixed",
                                size=5, overlap=0)
    df = chunks.to_pandas().sort_values(["doc_id", "chunk_index"])
    assert df[df["doc_id"] == 1]["total_chunks"].iloc[0] == 4
    assert df[df["doc_id"] == 2]["chunk_text"].iloc[0] == "xx"
    # merge back: chunk texts concatenated in order
    merged = ch.merge_chunk_results(chunks, "doc_id",
                                    list_cols=["chunk_text"]).to_pandas()
    m1 = merged[merged["doc_id"] == 1].iloc[0]
    assert "".join(m1["chunk_text"]) == "aaaa bbbb cccc dddd"
    assert m1["n_chunks"] == 4


# ---------------------------------------------------------------------------
# consensus (reference consensus.py semantics)
# ---------------------------------------------------------------------------

def test_majority_vote(ray_session):
    import ray.data as rd
    from prompture_ray.stages.consensus import majority_vote
    ds = rd.from_arrow(pa.table({
        "k": ["a"] * 5 + ["b"] * 3,
        "v": ["x", "x", "x", "y", "z", "p", "p", "q"],
    }))
    out = majority_vote(ds, "k", "v").to_pandas().sort_values("k")
    assert out["majority"].tolist() == ["x", "p"]
    assert out["agreement"].tolist() == [0.6, round(2 / 3, 6)]


def test_majority_tolerant_floats(ray_session):
    import ray.data as rd
    from prompture_ray.stages.consensus import majority_vote
    # 100.0 and 100.5 agree within 1% tolerance; 200 is an outlier
    ds = rd.from_arrow(pa.table({
        "k": ["a"] * 3, "v": [100.0, 100.5, 200.0]}))
    out = majority_vote(ds, "k", "v", tolerant_floats=True).to_pandas()
    assert abs(out["majority"].iloc[0] - 100.25) < 1.0
    assert out["agreement"].iloc[0] == round(2 / 3, 6)


def test_weighted_average(ray_session):
    import ray.data as rd
    from prompture_ray.stages.consensus import weighted_average
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"], "v": [10.0, 20.0, 5.0], "w": [1.0, 3.0, 2.0]}))
    out = weighted_average(ds, "k", "v", "w").to_pandas().sort_values("k")
    assert out["weighted_avg"].tolist() == [17.5, 5.0]


def test_self_consistency(ray_session):
    import ray.data as rd
    from prompture_ray.stages.consensus import self_consistency
    ds = rd.from_arrow(pa.table({
        "k": ["q1"] * 3, "ans": ["  Paris!", "paris", "London"]}))
    out = self_consistency(ds, "k", "ans").to_pandas()
    assert out["consensus_answer"].iloc[0] == "paris"
    assert out["consistency"].iloc[0] == round(2 / 3, 6)


# ---------------------------------------------------------------------------
# output formats (reference formats.py semantics)
# ---------------------------------------------------------------------------

def test_formats(ray_session):
    import ray.data as rd
    from prompture_ray.pipelines.formats import (
        to_jsonl_column, to_sharegpt, to_alpaca)
    ds = rd.from_arrow(pa.table({
        "q": ["what?"], "a": ["that."], "id": [1]}))
    j = json.loads(to_jsonl_column(ds).to_pandas()["json"].iloc[0])
    assert j == {"a": "that.", "id": 1, "q": "what?"}
    sg = json.loads(to_sharegpt(ds, "q", "a").to_pandas()["sharegpt"].iloc[0])
    assert sg["conversations"][0] == {"from": "human", "value": "what?"}
    al = json.loads(to_alpaca(ds, "q", "a").to_pandas()["alpaca"].iloc[0])
    assert al == {"instruction": "what?", "input": "", "output": "that."}


def test_chunk_markdown():
    from prompture_ray.stages.chunk import chunk_markdown
    md = ("# Title\nintro text\n\n## Section A\nalpha\nbeta\n"
          "## Section B\ngamma\n")
    chunks = chunk_markdown(md)
    assert chunks == ["intro text", "alpha\nbeta", "gamma"]
    assert chunk_markdown("") == []
    assert chunk_markdown("no headers\nat all") == ["no headers\nat all"]
    lines = chunk_markdown(md, return_each_line=True)
    assert "alpha" in lines and "beta" in lines


def test_chunk_semantic_breakpoints():
    from prompture_ray.stages.chunk import chunk_semantic
    # two topic islands: fox sentences vs database sentences — the
    # trigram-embedding distance spikes at the topic shift
    text = ("the quick brown fox jumps high. the quick brown fox runs fast. "
            "the brown fox naps now. database query planners optimize joins. "
            "database engines scan columnar batches.")
    chunks = chunk_semantic(text, threshold_type="percentile",
                            threshold_amount=75.0)
    assert len(chunks) >= 2
    assert "".join(chunks).count("fox") == 3       # nothing lost
    joined = " ".join(chunks)
    for word in ("fox", "database"):
        assert word in joined
    # single sentence passes through
    assert chunk_semantic("just one sentence") == ["just one sentence"]
    assert chunk_semantic("") == []


def test_chunk_documents_semantic_strategy(ray_session):
    import ray.data as rd
    from prompture_ray.stages.chunk import chunk_documents
    ds = rd.from_items([{"doc_id": 0,
                         "text": "aa bb cc. aa bb dd. zz yy xx. zz yy ww."}])
    out = chunk_documents(ds, "text", "doc_id", strategy="semantic",
                          threshold_amount=75.0).to_pandas()
    assert out["total_chunks"].iloc[0] == len(out)
    assert len(out) >= 1


def test_budget_guard():
    import pytest
    from prompture_ray.state.checkpoint import (
        BudgetExceededError, check_budget)
    totals = {"rows": 1000, "violations": 50, "elapsed_ms_sum": 4000.0}
    check_budget(totals, max_rows=2000, max_violations=100,
                 max_violation_rate=0.1, max_elapsed_ms=10_000)
    with pytest.raises(BudgetExceededError) as e:
        check_budget(totals, max_rows=500)
    assert e.value.kind == "rows"
    with pytest.raises(BudgetExceededError):
        check_budget(totals, max_violation_rate=0.01)
    with pytest.raises(BudgetExceededError):
        check_budget(totals, max_elapsed_ms=1000)


def test_run_suite_budget(ray_session, tmp_path):
    """Crossing a budget mid-run raises but keeps completed partitions
    checkpointed (resumable stop, reference BudgetExceededError)."""
    import pytest
    from prompture_ray.synth import generate
    from prompture_ray.specs import default_webpages_suite
    from prompture_ray.pipelines.validate_pipeline import run_suite
    from prompture_ray.state.checkpoint import BudgetExceededError
    generate(str(tmp_path / "d"), n_rows=2000, n_parts=4)
    suite = default_webpages_suite()
    with pytest.raises(BudgetExceededError):
        run_suite(str(tmp_path / "d" / "pages"), suite,
                  str(tmp_path / "out"), budget={"max_rows": 600})
    # at least one partition completed and is checkpointed
    done = list((tmp_path / "out" / "manifest").glob("*.json"))
    assert len(done) >= 1
    # re-run with a raised budget resumes and completes
    report = run_suite(str(tmp_path / "d" / "pages"), suite,
                       str(tmp_path / "out"), budget={"max_rows": 10_000})
    assert report["run"]["rows"] == 2000


def test_toon_roundtrip(ray_session):
    import ray.data as rd
    from prompture_ray.pipelines.formats import (
        to_toon, toon_encode_table, toon_decode)
    t = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "name": pa.array(["Laptop", "a,b comma", "true"]),
        "price": pa.array([999.99, 19.99, None], type=pa.float64()),
        "ok": pa.array([True, False, None]),
    })
    s = toon_encode_table(t)
    lines = s.split("\n")
    assert lines[0] == "[3]{id,name,price,ok}:"
    assert lines[1] == "  1,Laptop,999.99,true"
    assert lines[2] == '  2,"a,b comma",19.99,false'
    assert lines[3] == '  3,"true",null,null'
    key, recs = toon_decode(s)
    assert key is None
    assert recs[0] == {"id": 1, "name": "Laptop", "price": 999.99,
                       "ok": True}
    assert recs[1]["name"] == "a,b comma"
    assert recs[2] == {"id": 3, "name": "true", "price": None, "ok": None}
    # named block + distributed projection (one block per shard)
    s2 = toon_encode_table(t, key="products")
    assert s2.startswith("products[3]{")
    assert toon_decode(s2)[0] == "products"
    ds = rd.from_arrow(t).repartition(2)
    blocks = to_toon(ds, key="rows").to_pandas()["toon"].tolist()
    assert len(blocks) == 2
    total = sum(len(toon_decode(b)[1]) for b in blocks)
    assert total == 3


def test_chunk_gpt2_tokens_lossless_and_budget():
    from prompture_ray.stages.chunk import chunk_gpt2_tokens, _GPT2_PY_RE
    text = "Hello world, it's a test! Don't stop; 42 items _now_.\nNew line."
    # every char matched exactly once -> join reproduces the text
    assert "".join(_GPT2_PY_RE.findall(text)) == text
    chunks = chunk_gpt2_tokens(text, n_tokens=5)
    assert chunks
    toks = _GPT2_PY_RE.findall(text)
    # all chunks except the last carry exactly 5 tokens
    assert all(len(_GPT2_PY_RE.findall(" " + c)) <= 5 + 1 for c in chunks)
    assert chunk_gpt2_tokens("", 5) == []
    # overlap: consecutive chunks share tokens
    ov = chunk_gpt2_tokens(text, n_tokens=6, overlap=2)
    assert len(ov) >= len(chunk_gpt2_tokens(text, n_tokens=6))


def test_gpt2_token_count_matches_duckdb():
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    from prompture_ray.stages.textstats import GPT2_SPLIT_RE
    texts = ["Hello world, it's 42 tokens-ish! Ünïcøde tëst.", "",
             "a  b\n\nc", "don't stop", "  leading and trailing  "]
    eng = pc.count_substring_regex(pa.array(texts), GPT2_SPLIT_RE) \
        .to_pylist()
    con = duckdb.connect()
    sql = [r[0] for r in con.execute(
        "SELECT len(regexp_extract_all(t, ?)) "
        "FROM (SELECT unnest(?) AS t)", [GPT2_SPLIT_RE, texts]).fetchall()]
    assert eng == sql
