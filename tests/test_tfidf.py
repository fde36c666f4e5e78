"""TF-IDF top-k terms (stages/tfidf.py): hand-checked ranking, exact
tf/df scores, tie-breaking, path equality (broadcast vs bucketed join),
empty/short docs."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.tfidf import tfidf_topk_terms


def _ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


TEXTS = [
    "apple banana apple cherry",      # apple tf2, banana tf1, cherry tf1
    "banana banana date",             # banana tf2, date tf1
    "apple date date date",           # date tf3, apple tf1
    "",                               # empty: no rows
    "elderberry",                     # single term
]
# df: apple 2, banana 2, cherry 1, date 2, elderberry 1


def _run(**kw):
    df = tfidf_topk_terms(_ds(TEXTS), "text", "doc_id", k=3, **kw) \
        .to_pandas().sort_values(["id", "rank"], ignore_index=True)
    return df


def test_ranking_hand_checked(ray_session):
    df = _run()
    d0 = df[df["id"] == 0]
    # doc0: apple 2/2=1.0 > cherry 1/1=1.0 — tie! both 1.0 → term asc:
    # apple < cherry; banana 1/2=0.5 last
    assert list(d0["term"]) == ["apple", "cherry", "banana"]
    assert list(d0["score"]) == [1.0, 1.0, 0.5]
    d1 = df[df["id"] == 1]
    assert list(d1["term"]) == ["banana", "date"]
    assert list(d1["score"]) == [1.0, 0.5]
    d2 = df[df["id"] == 2]
    assert list(d2["term"]) == ["date", "apple"]
    assert list(d2["score"]) == [1.5, 0.5]
    assert (df["id"] == 3).sum() == 0          # empty doc: no rows
    d4 = df[df["id"] == 4]
    assert list(d4["term"]) == ["elderberry"]
    assert list(d4["score"]) == [1.0]
    # df values are corpus-global
    assert int(df[(df["id"] == 0) & (df["term"] == "apple")]["df"].iloc[0]) == 2
    assert int(df[(df["id"] == 4) & (df["term"] == "elderberry")]["df"].iloc[0]) == 1


def test_paths_equal(ray_session):
    a = _run()
    b = _run(broadcast_max=0, n_buckets=4)
    pa_a = a.reset_index(drop=True)
    pa_b = b.reset_index(drop=True)
    assert pa_a.equals(pa_b)


def test_case_and_whitespace(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": pa.array(["  Foo\tfoo\nBAR "], type=pa.string())}))
    df = tfidf_topk_terms(ds, "text", "doc_id", k=3).to_pandas() \
        .sort_values("rank", ignore_index=True)
    assert list(df["term"]) == ["foo", "bar"]
    assert list(df["tf"]) == [2, 1]
    # scores are single exact divisions
    assert list(df["score"]) == [2.0, 1.0]
