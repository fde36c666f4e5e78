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


def test_vocab_coverage(ray_session):
    """OOV / lexical-diversity signals vs a pure-Python reference;
    broadcast and bucketed-join paths agree; zero-token docs emit no
    row."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from prompture_ray.stages.tfidf import vocab_coverage

    texts = {
        1: "alpha beta alpha gamma",
        2: "alpha beta beta",
        3: "rare1 rare2 alpha",
        4: "",                       # no row
        5: "Alpha BETA alpha",       # lowercased
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)])}))

    # reference: df over per-doc distinct lowercased tokens
    toks = {k: v.lower().split() for k, v in texts.items()}
    df = Counter()
    for v in toks.values():
        for t in set(v):
            df[t] += 1
    want = {}
    for k, v in toks.items():
        if not v:
            continue
        oov = sum(1 for t in v if df[t] < 2)
        want[k] = (len(v), len(set(v)), oov, oov / len(v))

    for bmax in (20_000_000, 0):
        out = vocab_coverage(ds, "text", "doc_id", min_df=2,
                             broadcast_max=bmax).to_pandas()
        got = {int(r["id"]): (int(r["n_tokens"]), int(r["n_distinct"]),
                              int(r["n_oov"]), float(r["oov_rate"]))
               for _, r in out.iterrows()}
        assert got == want, bmax
