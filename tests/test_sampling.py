

def test_domain_cap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.sampling import domain_cap
    rng = np.random.default_rng(7)
    doms = rng.choice(["a.com", "b.org", "c.net", "d.io"], size=60)
    ids = rng.permutation(10_000)[:60].astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "host": pa.array(doms)})) \
        .repartition(5)            # force cross-batch candidate merging
    cap = 4
    expect = {}
    for d in set(doms):
        kept = sorted(ids[doms == d])[:cap]
        for i in ids[doms == d]:
            expect[int(i)] = bool(i in kept)
    for bmax in (20_000_000, 0):   # broadcast AND bucketed paths
        df = domain_cap(ds, "host", "doc_id", cap=cap,
                        broadcast_max=bmax).to_pandas()
        got = {int(r["id"]): bool(r["keep"]) for _, r in df.iterrows()}
        assert got == expect, (bmax,)
        assert set(df.columns) == {"id", "host", "keep"}


def test_pack_sequences(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.sampling import pack_sequences
    rng = np.random.default_rng(11)
    ids = np.sort(rng.permutation(50_000)[:40]).astype(np.int64)
    counts = rng.integers(1, 900, size=40).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "ntok": pa.array(counts)})) \
        .repartition(4)
    budget = 2048
    df = pack_sequences(ds, "doc_id", "ntok", budget) \
        .to_pandas().sort_values("id", ignore_index=True)
    prefix = np.concatenate([[0], np.cumsum(counts)[:-1]])
    assert (df["offset_in_stream"].to_numpy() == prefix).all()
    assert (df["bin"].to_numpy() == prefix // budget).all()
    assert (df["id"].to_numpy() == ids).all()


def test_sample_k_per_group_layout_independent(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from prompture_ray.stages.sampling import sample_k_per_group
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 500),
                       "id": np.arange(500, dtype="int64")})
    outs = []
    for parts in (1, 9):
        o = sample_k_per_group(rd.from_pandas(df).repartition(parts),
                               "g", "id", k=5).to_pandas() \
            .sort_values(["g", "rk"], ignore_index=True)
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0].groupby("g").size() == 5).all()
    # draw order is the Knuth rule, not id order
    truth = df.copy()
    truth["h"] = (truth["id"].to_numpy().astype(np.uint64)
                  * np.uint64(2654435761)) % np.uint64(1 << 32)
    first = truth.sort_values(["g", "h", "id"]).groupby("g").head(1) \
        .sort_values("g")["id"].tolist()
    got_first = outs[0][outs[0]["rk"] == 1].sort_values("g")["id"].tolist()
    assert got_first == first


def test_assign_shards(ray_session):
    """assign_shards == pandas row_number reference, including 32-bit
    Knuth-hash ties (id and id + 2^32 hash identically; ties break by
    id), under multi-block layout and tiny cells."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.sampling import assign_shards

    rng = np.random.default_rng(7)
    ids = rng.choice(2**20, 3000, replace=False).astype(np.int64)
    ids = np.concatenate([ids, ids[:25] + 2**32])   # forced hash ties
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array(ids * 3, type=pa.int64()),
    })).repartition(13)

    out = assign_shards(ds, "doc_id", n_shards=8, cells_per_shard=16) \
        .to_pandas()

    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    ref = pd.DataFrame({"doc_id": ids, "h": h.astype(np.int64)})
    ref["shard"] = (h % np.uint64(8)).astype(np.int64)
    ref = ref.sort_values(["shard", "h", "doc_id"], kind="mergesort")
    ref["pos"] = ref.groupby("shard", sort=False).cumcount()

    m = out.merge(ref[["doc_id", "shard", "pos"]], on="doc_id",
                  suffixes=("", "_ref"))
    assert len(m) == len(ids)
    assert (m["shard"] == m["shard_ref"]).all()
    assert (m["pos"] == m["pos_ref"]).all()
    # payload columns survive
    assert (m["payload"] == m["doc_id"] * 3).all()
    # every shard's positions are exactly 0..n_shard-1
    for s, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_priority_sample_k(ray_session):
    """Priority sampling == pandas reference; deterministic under
    layout; zero-hash edge covered by the +1 shift."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.stages.sampling import priority_sample_k

    rng = np.random.default_rng(5)
    n = 2000
    ids = np.concatenate([rng.choice(10**7, n - 1, replace=False)
                          .astype(np.int64), [0]])   # id=0: h=0 edge
    grp = (ids % 5).astype(np.int64)
    w = (ids % 9 + 1).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "g": pa.array(grp, type=pa.int64()),
        "w": pa.array(w, type=pa.int64())})).repartition(7)

    out = priority_sample_k(ds, "id", "w", "g", 3).to_pandas()

    h = ((ids.astype(np.uint64) * np.uint64(2654435761))
         % np.uint64(2**32)).astype(np.int64) + 1
    ref = pd.DataFrame({"id": ids, "g": grp,
                        "pr": (w * np.int64(2**32)) / h})
    ref = ref.sort_values(["g", "pr", "id"],
                          ascending=[True, False, True],
                          kind="mergesort")
    ref = ref.groupby("g", sort=False).head(3)
    want = {(int(r["g"]), int(r["id"])) for _, r in ref.iterrows()}
    got = {(int(r["g"]), int(r["id"])) for _, r in out.iterrows()}
    assert got == want
    assert sorted(out.groupby("g")["rk"].max()) == [3, 3, 3, 3, 3]
