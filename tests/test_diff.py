"""Corpus snapshot diff (stages/diff.py)."""
import pyarrow as pa

from prompture_ray.stages.diff import corpus_diff


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows])}))


def test_corpus_diff(ray_session):
    old = _ds([(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _ds([(2, "b"), (3, "C!"), (4, None), (5, "e")])
    df = corpus_diff(old, new, "doc_id", "text").to_pandas() \
        .sort_values("id", ignore_index=True)
    got = dict(zip(df["id"], df["status"]))
    assert got == {1: "removed", 2: "same", 3: "changed",
                   4: "same", 5: "added"}


def test_corpus_diff_multiblock(ray_session):
    n = 300
    old = _ds([(i, f"t{i}") for i in range(n)]).repartition(5)
    new = _ds([(i, f"t{i}" if i % 3 else f"x{i}")
               for i in range(10, n + 10)]).repartition(7)
    df = corpus_diff(old, new, "doc_id", "text").to_pandas()
    got = dict(zip(df["id"], df["status"]))
    assert len(got) == n + 10
    for i in range(10):
        assert got[i] == "removed"
        assert got[n + i] == "added"
    for i in range(10, n):
        assert got[i] == ("changed" if i % 3 == 0 else "same")
