"""C4 line/page filter (stages/c4.py) — each rule as the sole dropper,
page rules, empty rejoin."""
import pyarrow as pa


def _run(texts: dict, **kw):
    import ray.data as rd
    from prompture_ray.stages.c4 import c4_line_filter
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    }))
    out = c4_line_filter(ds, "text", "doc_id", **kw) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    return {int(r["doc_id"]): (r["text"], int(r["n_lines_kept"]),
                               bool(r["page_kept"]))
            for _, r in out.iterrows()}


GOOD = "this line ends with enough words."
GOOD2 = "another fine sentence with plenty of words!"
GOOD3 = 'a third quoted keeper line ends well?'


def test_c4_line_rules(ray_session):
    got = _run({
        # each rule fires alone
        1: "\n".join([GOOD, GOOD2, GOOD3,
                      "no terminal punctuation on this long line",  # punct
                      "tiny line here.",                            # words
                      "please enable JavaScript to see this page."]),  # js
        # page kept: exactly 3 kept lines
        2: "\n".join([GOOD, GOOD2, GOOD3]),
        # page dropped: only 2 kept lines
        3: "\n".join([GOOD, GOOD2]),
        # page dropped: curly bracket in raw text (line itself kept)
        4: "\n".join([GOOD, GOOD2, GOOD3, "code with { brace"]),
        # page dropped: lorem ipsum phrase (case-insensitive)
        5: "\n".join([GOOD, GOOD2, GOOD3, "Lorem Ipsum dolor sit amet."]),
        # nothing survives: empty rejoin, zero kept
        6: "all lowercase no punct\nshort one.",
    })
    assert got[1] == ("\n".join([GOOD, GOOD2, GOOD3]), 3, True)
    assert got[2] == ("\n".join([GOOD, GOOD2, GOOD3]), 3, True)
    assert got[3] == ("\n".join([GOOD, GOOD2]), 2, False)
    # brace line itself fails the punct rule (3 kept) but the page rule
    # fires on the RAW text
    assert got[4][1] == 3 and got[4][2] is False
    assert got[5][2] is False
    assert got[6] == ("", 0, False)


def test_c4_thresholds(ray_session):
    # min_words / min_lines are parameters, not baked constants
    got = _run({1: "four words right here.\nsecond tiny keeper line."},
               min_words=4, min_lines=2)
    assert got[1] == ("four words right here.\nsecond tiny keeper line.",
                      2, True)
    got = _run({1: "four words right here.\nsecond tiny keeper line."},
               min_words=5, min_lines=1)
    assert got[1] == ("", 0, False)
