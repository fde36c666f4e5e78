"""textclean (NFC + mojibake) and weighted/resampling operators."""
import numpy as np
import pyarrow as pa

from prompture_ray.stages.textclean import clean_text, fix_mojibake_value


def test_fix_mojibake_value():
    assert fix_mojibake_value("CafÃ©") == "Café"
    assert fix_mojibake_value("naÃ¯ve") == "naïve"
    # cp1252 tail: ’ became â€™ (â + € + ™)
    assert fix_mojibake_value("itâ€™s") == "it’s"
    # clean text is untouched (idempotent / conservative)
    assert fix_mojibake_value("Café") == "Café"
    assert fix_mojibake_value("plain ascii") == "plain ascii"


def test_clean_text(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(["hello world",          # clean ASCII
                          "Café",           # decomposed → NFC
                          "CafÃ©",                # latin-1 mojibake
                          "itâ€™s fine",          # cp1252 mojibake
                          None])}))               # null → ""
    df = clean_text(ds, "text").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(df["text"]) == ["hello world", "Café", "Café",
                                "it’s fine", ""]
    assert list(df["nfc_changed"]) == [False, True, False, False, False]
    assert list(df["moji_fixed"]) == [False, False, True, True, False]


def test_clean_text_matches_duckdb_nfc(ray_session):
    """Engine NFC == DuckDB nfc_normalize on mixed planted strings."""
    import duckdb
    import ray.data as rd
    samples = ["Café olé", "ﬁne Å", "Å",
               "ascii only", "ümlaut ok"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(samples)), type=pa.int64()),
        "text": pa.array(samples)}))
    df = clean_text(ds, "text", mojibake=False).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    for i, s in enumerate(samples):
        sql = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert df["text"][i] == sql


def test_weighted_sample_and_repeat(ray_session):
    import ray.data as rd
    from prompture_ray.stages.sampling import (weighted_sample,
                                               repeat_by_weight,
                                               _keep_mask)
    n = 200
    w = np.where(np.arange(n) % 2 == 0, 0.25, 2.5)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "w": pa.array(w, type=pa.float64())}))
    kept = weighted_sample(ds, "id", "w").to_pandas()
    ids = np.arange(n, dtype=np.int64)
    exp_keep = _keep_mask(ids, np.minimum(w, 1.0))
    assert sorted(kept["id"]) == list(ids[exp_keep])

    plan = repeat_by_weight(ds, "id", "w", emit_rows=False).to_pandas() \
        .sort_values("id", ignore_index=True)
    exp_n = np.floor(w).astype(np.int64) + _keep_mask(ids, w - np.floor(w))
    assert list(plan["n_copies"]) == list(exp_n)

    rows = repeat_by_weight(ds, "id", "w").to_pandas()
    g = rows.groupby("id").agg(n=("copy_idx", "size"),
                               mx=("copy_idx", "max"))
    for i, r in g.iterrows():
        assert r["n"] == exp_n[i] and r["mx"] == exp_n[i] - 1
    assert set(rows["id"]) == set(ids[exp_n > 0])


def test_badword_flags(ray_session):
    import ray.data as rd
    from prompture_ray.stages.textstats import badword_flags
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(["clean words only", "one BAD token",
                          "bad bad evil", "", None])}))
    df = badword_flags(ds, "text", ["bad", "evil"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(df["n_hits"]) == [0, 1, 3, 0, 0]   # case-insensitive
    assert list(df["keep"]) == [True, False, False, True, True]
    # case-sensitive + threshold
    df2 = badword_flags(ds, "text", ["bad"], max_hits=2,
                        lowercase=False).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(df2["n_hits"]) == [0, 0, 2, 0, 0]
    assert df2["keep"].all()
