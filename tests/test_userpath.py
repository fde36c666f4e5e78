"""Funnel + retention (stages/userpath.py): hand-checked semantics
(strictly-after reach times, first-day cohorts) and partition-layout
independence."""

import numpy as np
import pandas as pd


def _events(rows):
    import ray.data as rd
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return rd.from_pandas(df).repartition(5)


def test_funnel_strictly_after(ray_session):
    from prompture_ray.stages.userpath import funnel_counts
    rows = [
        # user 1: full funnel in order
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # user 2: b BEFORE a only -> stops at step 1
        (2, 50, "b"), (2, 60, "a"),
        # user 3: b at the SAME ts as a -> strictly-after fails step 2
        (3, 100, "a"), (3, 100, "b"),
        # user 4: a, late b, no c -> step 2
        (4, 5, "a"), (4, 500, "b"),
        # user 5: never does a
        (5, 7, "c"), (5, 8, "b"),
        # noise types are ignored
        (1, 15, "zzz"),
    ]
    out = funnel_counts(_events(rows), "user_id", "ts", "event_type",
                        ["a", "b", "c"], n_parts=7).to_pandas() \
        .sort_values("step", ignore_index=True)
    assert out["event_type"].tolist() == ["a", "b", "c"]
    assert out["users"].tolist() == [4, 2, 1]


def test_funnel_layout_independent(ray_session):
    from prompture_ray.stages.userpath import funnel_counts
    rng = np.random.default_rng(11)
    n = 5000
    rows = list(zip(rng.integers(0, 300, n),
                    rng.integers(0, 10**6, n),
                    rng.choice(["a", "b", "c", "x"], n)))
    base = None
    for parts in (7, 64):
        out = funnel_counts(_events(rows), "user_id", "ts", "event_type",
                            ["a", "b", "c"], n_parts=parts).to_pandas() \
            .sort_values("step", ignore_index=True)
        if base is None:
            base = out
        else:
            pd.testing.assert_frame_equal(out, base)


def test_retention_matches_pandas(ray_session):
    from prompture_ray.stages.userpath import retention_cohorts
    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 150, n),
        "ts": pd.to_datetime(rng.integers(0, 30 * 86400, n), unit="s"),
    })
    import ray.data as rd
    out = retention_cohorts(rd.from_pandas(df).repartition(9),
                            "user_id", "ts", n_parts=13).to_pandas() \
        .sort_values(["cohort_day", "day_offset"], ignore_index=True)

    d = df.copy()
    d["day"] = d["ts"].astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    ud = d[["user_id", "day"]].drop_duplicates()
    day0 = ud.groupby("user_id")["day"].transform("min")
    truth = pd.DataFrame({"cohort_day": day0, "day_offset": ud["day"] - day0}) \
        .groupby(["cohort_day", "day_offset"]).size().rename("users") \
        .reset_index().sort_values(["cohort_day", "day_offset"],
                                   ignore_index=True)
    truth["users"] = truth["users"].astype("int64")
    pd.testing.assert_frame_equal(out, truth)
    # day-0 row of every cohort counts the whole cohort
    z = out[out["day_offset"] == 0]
    assert z["users"].sum() == ud["user_id"].nunique()
