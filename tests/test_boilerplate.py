"""Per-host boilerplate removal (stages/boilerplate.py): hand-checked
thresholds + broadcast path == bucketed-join path."""

import pandas as pd


def _docs():
    import ray.data as rd
    rows = []
    # host A: 4 docs, "nav A" on all (removed), "semi" on 2 of 4
    # (2*2 >= 4 -> removed at frac 1/2), "rare" on 1 (kept)
    rows.append((0, "A", "nav A\nbody zero\nsemi\nfooter A"))
    rows.append((1, "A", "nav A\nbody one\nsemi\nfooter A"))
    rows.append((2, "A", "nav A\nbody two\nfooter A"))
    rows.append((3, "A", "nav A\nrare\nbody three\nfooter A"))
    # host B: 3 docs; "semi" also exists on B but only 1/3 (kept —
    # thresholds are PER HOST); footer B on 2/3 (2*2 >= 3 -> removed)
    rows.append((4, "B", "semi\nbody four\nfooter B"))
    rows.append((5, "B", "body five\nfooter B"))
    rows.append((6, "B", "body six"))
    # host C: one doc that is pure chrome after removal is impossible
    # (single doc: df=1 < min_docs) -> everything kept
    rows.append((7, "C", "nav C\nfooter C"))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    return rd.from_pandas(df).repartition(3)


def _run(**kw) -> pd.DataFrame:
    from prompture_ray.stages.boilerplate import boilerplate_lines
    out = boilerplate_lines(_docs(), min_docs=2, frac_num=1, frac_den=2,
                            **kw).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def test_hand_values(ray_session):
    out = _run()
    t = dict(zip(out["doc_id"], out["text"]))
    assert t[0] == "body zero"
    assert t[2] == "body two"
    assert t[3] == "rare\nbody three"
    assert t[4] == "semi\nbody four"      # per-host: semi kept on B
    assert t[6] == "body six"
    assert t[7] == "nav C\nfooter C"      # single-doc host: all kept
    assert out.set_index("doc_id").loc[1, "n_removed"] == 3
    assert out.set_index("doc_id").loc[7, "n_removed"] == 0


def test_bucketed_path_equals_broadcast(ray_session):
    a = _run()
    b = _run(broadcast_max=0, n_buckets=4)
    pd.testing.assert_frame_equal(
        a, b[a.columns.tolist()].sort_values("doc_id",
                                             ignore_index=True))


def test_empty_after_removal(ray_session):
    import ray.data as rd
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["H"] * 3,
        "text": ["nav\nfooter", "nav\nbody\nfooter", "nav\nfooter"],
    })
    from prompture_ray.stages.boilerplate import boilerplate_lines
    out = boilerplate_lines(rd.from_pandas(df).repartition(2),
                            min_docs=2, frac_num=1, frac_den=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["text"].tolist() == ["", "body", ""]
    assert out["n_kept"].tolist() == [0, 1, 0]


def test_empty_and_single_line_docs(ray_session):
    import ray.data as rd
    from prompture_ray.stages.boilerplate import boilerplate_lines
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "source": ["H", "H", "H", "H"],
        "text": ["", "nav", "nav", "solo body"],
    })
    out = boilerplate_lines(rd.from_pandas(df), min_docs=2,
                            frac_num=1, frac_den=2).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    # '' occurs in 1 doc (kept); 'nav' in 2 of 4 -> 2*2 >= 4 removed
    assert out["text"].tolist() == ["", "", "", "solo body"]
    assert out["n_removed"].tolist() == [0, 1, 1, 0]
