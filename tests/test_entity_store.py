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
