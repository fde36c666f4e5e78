import numpy as np
import pyarrow as pa

from prompture_ray.stages.classify import (nb_train_counts, train_nb,
                                           nb_classify)


def test_nb_train_counts_and_model(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b a", "a b", "c c"]),
        "label": pa.array(["spam", "spam", "ham"])}))
    cdf = nb_train_counts(ds, "text", "label").to_pandas() \
        .sort_values(["label", "token"], ignore_index=True)
    got = {(r["label"], r["token"]): int(r["cnt"])
           for _, r in cdf.iterrows()}
    assert got == {("spam", "a"): 3, ("spam", "b"): 2, ("ham", "c"): 2}

    m = train_nb(ds, "text", "label", alpha=1.0)
    assert list(m["classes"]) == ["ham", "spam"]
    # hand-computed: V=3; spam totals 5 -> P(a|spam)=(3+1)/8
    vi = {h: i for i, h in enumerate(m["vocab"])}
    from prompture_ray.functions.sketches import hash64
    ha = hash64(np.array(["a"], dtype=object)).view(np.int64)[0]
    spam_i = 1
    assert np.isclose(m["log_prob"][spam_i][vi[ha]], np.log(4 / 8))
    assert np.isclose(m["log_prior"][spam_i], np.log(2 / 3))


def test_nb_classify(ray_session):
    import ray.data as rd
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(["buy pills now", "win pills buy",
                          "meeting notes today", "report notes today"]),
        "label": pa.array(["spam", "spam", "ham", "ham"])}))
    m = train_nb(train, "text", "label")
    test = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(["pills win", "notes meeting report",
                          "pills notes pills", "zzz unknown", ""])}))
    df = nb_classify(test, "text", "doc_id", m).to_pandas() \
        .sort_values("id", ignore_index=True)
    got = dict(zip(df["id"], df["pred"]))
    assert got[0] == "spam" and got[1] == "ham" and got[2] == "spam"
    assert 3 in got          # OOV-only doc falls to the prior (tie ->
    assert 4 not in got      # first class); empty docs are dropped
