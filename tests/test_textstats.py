"""Text analysis stages: token counts, quality features, language ID,
fingerprints, filter stats."""

import pyarrow as pa
import pytest

from prompture_ray.stages import textstats as ts


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "The quick brown fox jumps over the lazy dog and runs far away today",
            "der hund und die katze sind nicht mit dem vogel ein haus",
            "!!! ??? ...",
            "le chat est dans la maison pour le moment avec une souris",
        ],
    }))


def test_token_counts(docs):
    out = ts.add_token_counts(docs, "text").to_pandas().sort_values("doc_id")
    assert out["n_ws_tokens"].tolist() == [14, 12, 3, 12]
    assert (out["n_bpe_tokens"] >= out["n_ws_tokens"]).all()


def test_quality_features_and_score(docs):
    out = ts.add_quality_score(docs, "text").to_pandas().sort_values("doc_id")
    assert out.loc[out["doc_id"] == 2, "keep"].iloc[0] == False  # noqa: E712
    assert out.loc[out["doc_id"] == 0, "keep"].iloc[0] == True   # noqa: E712
    assert out.loc[out["doc_id"] == 2, "drop_reason"].iloc[0] in (
        "drop:short_text", "drop:punct_heavy")
    s = out.loc[out["doc_id"] == 0, "quality_score"].iloc[0]
    assert 0 < s <= 1


def test_filter_stats_shape(docs):
    flagged = ts.add_quality_score(docs, "text")
    stats = ts.filter_stats(flagged)
    assert stats["total_in"] == 4
    assert stats["total_out"] == 3
    assert sum(stats["dropped_by_reason"].values()) == 1
    assert 0 < stats["drop_rate"] < 1


def test_langid(docs):
    out = docs.map_batches(ts.LangIdStage("text"),
                           batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id")
    assert out["lang_pred"].tolist()[0] == "en"
    assert out["lang_pred"].tolist()[1] in ("de", "nl")
    assert out["lang_pred"].tolist()[3] == "fr"


def test_fingerprint_stable_and_discriminative(docs, ray_session):
    import ray.data as rd
    fp = ts.fingerprint_docs(docs, "text", "doc_id").to_pandas() \
        .sort_values("doc_id")
    fp2 = ts.fingerprint_docs(docs, "text", "doc_id").to_pandas() \
        .sort_values("doc_id")
    assert fp["fingerprint"].tolist() == fp2["fingerprint"].tolist()
    vals = fp["fingerprint"].dropna().tolist()
    assert len(set(vals)) == len(vals)  # distinct docs → distinct fingerprints
    # identical doc → identical fingerprint
    dup = rd.from_arrow(pa.table({
        "doc_id": [10],
        "text": ["The quick brown fox jumps over the lazy dog and runs far away today"]}))
    fpd = ts.fingerprint_docs(dup, "text", "doc_id").to_pandas()
    assert fpd["fingerprint"].iloc[0] == fp["fingerprint"].iloc[0]


def test_langid_scripts(ray_session):
    import ray.data as rd
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["这是一个中文测试文档 机器学习 数据处理",
                 "これは日本語のテストです データ処理",
                 "это русский текст для проверки системы"],
    }))
    out = ds.map_batches(ts.LangIdStage("text"),
                         batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["zh", "ja", "ru"]


def test_repetition_signals(ray_session):
    import ray.data as rd
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "a b a b c",        # "a b" x2 (len 3) -> 6/9; unique 5-gram
            "x x x x x x",      # "x x" x5 -> 15/11; both 5-grams equal
            "p q r s t u v",    # no repeats: best 1*3 -> 3/13
            "a b",              # <5 tokens: dropped
        ]),
    }))
    out = ts.repetition_signals(ds).to_pandas() \
        .sort_values("id", ignore_index=True)
    assert out["id"].tolist() == [1, 2, 3]
    assert out["top_frac"].tolist() == [6 / 9, 15 / 11, 3 / 13]
    assert out["dup_frac"].tolist() == [0.0, 1.0, 0.0]


def test_corpus_frequency_score(ray_session):
    import ray.data as rd
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a b a", "b c"]),
    }))
    for bmax in (20_000_000, 0):     # broadcast path AND bucketed-join path
        out = ts.corpus_frequency_score(ds, broadcast_max=bmax) \
            .to_pandas().sort_values("id", ignore_index=True)
        # corpus: a=2, b=2, c=1, N=5
        assert out["count_sum"].tolist() == [6, 3], bmax
        assert out["n_tokens"].tolist() == [3, 2], bmax
        assert out["score"].tolist() == [6 / 15, 3 / 10], bmax
