"""Citation extraction: marker parse, claim spans, coverage rollup
(reference citations/core.py:121 extract_citations, types.py:99)."""

import pyarrow as pa

from prompture_ray.stages.citations import (
    parse_citations, extract_citation_rows, citation_summary)


def test_parse_citations_claims_and_spans():
    text = "Paris is the capital of France [1]. Both routes work [2, 5]."
    cites, clean = parse_citations(text)
    assert len(cites) == 2
    assert cites[0]["claim"] == "Paris is the capital of France"
    assert cites[0]["source_ids"] == ["1"]
    assert cites[0]["marker"] == "[1]"
    assert cites[1]["claim"] == "Both routes work"
    assert cites[1]["source_ids"] == ["2", "5"]
    assert clean == "Paris is the capital of France . Both routes work ."
    # marker positions span to the end of the bracket
    assert text[cites[0]["start"]:cites[0]["end"]].endswith("[1]")


def test_parse_citations_edge_cases():
    assert parse_citations("") == ([], "")
    assert parse_citations("no markers here.") == ([], "no markers here.")
    # newline is a sentence boundary; [12] with spaces in the id list
    cites, _ = parse_citations("line one\nclaim two [ 12 ]")
    assert cites == []          # spaces INSIDE brackets don't match (ref re)
    cites, _ = parse_citations("line one\nclaim two [12,13]")
    assert cites[0]["claim"] == "claim two"
    assert cites[0]["source_ids"] == ["12", "13"]


def test_citation_stages(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["A [1]. B [2, 9].", "nothing"]),
    }))
    rows = extract_citation_rows(ds).to_pandas()
    assert len(rows) == 2
    assert rows["claim"].tolist() == ["A", "B"]
    assert list(rows["source_ids"].tolist()[1]) == ["2", "9"]

    summ = citation_summary(ds, n_sources=3).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert summ["n_citations"].tolist() == [2, 0]
    # [9] is hallucinated (only 3 sources) -> cited {1,2}
    assert summ["n_cited_sources"].tolist() == [2, 0]
    assert summ["coverage"].round(6).tolist() == [0.666667, 0.0]
    assert summ["grounded"].tolist() == [True, False]
    assert summ["clean_text"][0] == "A . B ."
