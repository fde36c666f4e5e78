"""Entity store / mention resolution (reference kg/core.py semantics:
alias-aware case-insensitive resolve, typed lookup, upsert merge,
neighbor traversal)."""

import pandas as pd
import pyarrow as pa

from prompture_ray.stages.entity_store import (
    EntityStore, build_entity_store, make_entity_id, neighbors_of,
    normalize_name, resolve_mentions, upsert_entities_from_mentions,
)


def test_normalize_and_id():
    assert normalize_name("  Café   Müller ") == "cafe muller"
    assert make_entity_id("Café Müller", "place") == "place:cafe-muller"


def make_store():
    return EntityStore(pd.DataFrame({
        "entity_id": ["person:sam", "org:openai", "place:paris",
                      "person:paris"],
        "name": ["Sam Altman", "OpenAI", "Paris", "Paris"],
        "type": ["person", "org", "place", "person"],
        "aliases": [["sama"], ["Open AI"], [], []],
    }))


def test_resolve_typed_and_untyped():
    s = make_store()
    assert s.resolve("sam altman") == "person:sam"
    assert s.resolve("SAMA") == "person:sam"            # alias
    assert s.resolve("open ai") == "org:openai"         # alias w/ space
    # type disambiguation (reference core.py:63-72)
    assert s.resolve("Paris", type="place") == "place:paris"
    assert s.resolve("Paris", type="person") == "person:paris"
    # untyped collision → smallest entity_id wins deterministically
    assert s.resolve("Paris") == "person:paris"
    assert s.resolve("nobody") is None


def test_resolve_mentions_stage(ray_session):
    import ray.data as rd
    s = make_store()
    ds = rd.from_arrow(pa.table({
        "m": ["sam altman", "OPENAI", "junk", None]}))
    out = resolve_mentions(ds, "m", s).to_pandas()
    assert out["entity_id"].tolist() == [
        "person:sam", "org:openai", None, None]


def test_upsert_from_mentions(ray_session):
    import ray.data as rd
    s = make_store()
    ds = rd.from_arrow(pa.table({
        "m": ["sam altman", "New Corp", "NEW CORP", "Other Thing", None]}))
    ents = upsert_entities_from_mentions(ds, "m", s, type="org")
    # one new entity per normalized name; first surface form kept
    new = ents[~ents["entity_id"].isin(s.entities["entity_id"])]
    assert sorted(new["entity_id"]) == ["org:new-corp", "org:other-thing"]
    s2 = EntityStore(ents)
    assert s2.resolve("new corp", type="org") == "org:new-corp"
    assert s2.resolve("sam altman") == "person:sam"     # old still there


def test_neighbors(ray_session):
    import ray.data as rd
    rel = rd.from_arrow(pa.table({
        "subject_id": ["person:sam", "person:sam", "org:openai"],
        "predicate": ["works_at", "founded", "based_in"],
        "object_id": ["org:openai", "org:openai", "place:sf"],
    }))
    out = neighbors_of(rel, ["person:sam"]).to_pandas()
    assert sorted(out["predicate"]) == ["founded", "works_at"]
    inc = neighbors_of(rel, ["org:openai"], direction="in").to_pandas()
    assert sorted(inc["predicate"]) == ["founded", "works_at"]


def test_neighbors_of_directions_and_predicate(ray_session):
    import pyarrow as pa
    import ray.data as rd
    rel = rd.from_arrow(pa.table({
        "subject_id": pa.array([1, 2, 3], type=pa.int64()),
        "predicate": pa.array(["a", "b", "a"]),
        "object_id": pa.array([2, 3, 1], type=pa.int64()),
    }))
    from prompture_ray.stages.entity_store import neighbors_of
    out = neighbors_of(rel, [1], direction="out").to_pandas()
    assert out["object_id"].tolist() == [2]
    out = neighbors_of(rel, [1], direction="in").to_pandas()
    assert out["subject_id"].tolist() == [3]
    out = neighbors_of(rel, [1], direction="both").to_pandas() \
        .sort_values("subject_id")
    assert out["subject_id"].tolist() == [1, 3]
    out = neighbors_of(rel, [1], direction="both",
                       predicate="b").to_pandas()
    assert len(out) == 0


def test_k_hop_neighbors_min_hop(ray_session):
    import pyarrow as pa
    import ray.data as rd
    # 1->2->3->4, plus shortcut 1->3: node 3 is hop 1, never hop 2
    rel = rd.from_arrow(pa.table({
        "subject_id": pa.array([1, 2, 3, 1], type=pa.int64()),
        "predicate": pa.array(["x"] * 4),
        "object_id": pa.array([2, 3, 4, 3], type=pa.int64()),
    }))
    from prompture_ray.stages.entity_store import k_hop_neighbors
    out = k_hop_neighbors(rel, [1], k=2, direction="out")
    got = dict(zip(out["entity_id"], out["hop"]))
    assert got == {2: 1, 3: 1, 4: 2}
    out3 = k_hop_neighbors(rel, [4], k=3, direction="in")
    got3 = dict(zip(out3["entity_id"], out3["hop"]))
    assert got3 == {3: 1, 2: 2, 1: 2}


def test_mentions_of(ray_session):
    import pyarrow as pa
    import ray.data as rd
    m = rd.from_arrow(pa.table({
        "entity_id": pa.array([1, 2, 1], type=pa.int64()),
        "doc_id": pa.array([10, 20, 30], type=pa.int64()),
    }))
    from prompture_ray.stages.entity_store import mentions_of
    out = mentions_of(m, [1]).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [10, 30]


def test_k_hop_distributed_equals_driver(ray_session):
    """r4 verdict #3: the distributed path (frontier/visited as Datasets,
    two hash shuffles per hop) must equal the driver-set path on a random
    graph, both when forced (broadcast_max=0) and when the traversal
    ESCALATES mid-flight because visited outgrows an artificial driver
    cap. String ids exercise the np.isin membership branch."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.entity_store import k_hop_neighbors

    rng = np.random.RandomState(7)
    n, m = 400, 1600
    u = rng.randint(0, n, size=m)
    v = rng.randint(0, n, size=m)
    rel = rd.from_arrow(pa.table({
        "subject_id": pa.array(u, type=pa.int64()),
        "predicate": pa.array(["x"] * m),
        "object_id": pa.array(v, type=pa.int64())}))
    seeds = [0, 17, 101]

    ref = k_hop_neighbors(rel, seeds, k=3, direction="out")
    want = dict(zip(ref["entity_id"], ref["hop"]))
    assert len(want) > 50          # traversal actually reaches far

    forced = k_hop_neighbors(rel, seeds, k=3, direction="out",
                             broadcast_max=0, n_parts=8)
    assert dict(zip(forced["entity_id"], forced["hop"])) == want

    # cap of 10 ids: hop 1 runs on the driver, then visited outgrows the
    # cap and hops 2-3 run distributed — same answer
    esc = k_hop_neighbors(rel, seeds, k=3, direction="out",
                          broadcast_max=10, n_parts=8)
    assert dict(zip(esc["entity_id"], esc["hop"])) == want

    # inbound direction, as_dataset output form
    ref_in = k_hop_neighbors(rel, seeds, k=2, direction="in")
    got_in = k_hop_neighbors(rel, seeds, k=2, direction="in",
                             broadcast_max=0, n_parts=8,
                             as_dataset=True).to_pandas()
    assert dict(zip(got_in["entity_id"], got_in["hop"])) == \
        dict(zip(ref_in["entity_id"], ref_in["hop"]))

    # string ids (entity slugs) through the distributed path
    srel = rd.from_arrow(pa.table({
        "subject_id": pa.array(["a", "b", "c", "a"]),
        "predicate": pa.array(["x"] * 4),
        "object_id": pa.array(["b", "c", "d", "c"])}))
    sref = k_hop_neighbors(srel, ["a"], k=2, direction="out")
    sgot = k_hop_neighbors(srel, ["a"], k=2, direction="out",
                           broadcast_max=0, n_parts=4)
    assert dict(zip(sgot["entity_id"], sgot["hop"])) == \
        dict(zip(sref["entity_id"], sref["hop"])) == \
        {"b": 1, "c": 1, "d": 2}
