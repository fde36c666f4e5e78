"""Streaming event-time windows with actor-held incremental state.

The batch windows in ``stages/windows.py`` need the whole group; this is
the STREAMING form the build brief names explicitly: one actor per
key-hash bucket holds the open windows, batches are fed in event-time
order, a watermark (max ts seen minus allowed lateness) closes windows
incrementally, and results stream out long before the input ends.

ORDERING ASSUMPTION (stated per ray_guide): the input is an ordered,
partitioned log — within each fed batch stream, timestamps are
non-decreasing up to ``lateness``. Rows older than the watermark are
counted as ``late_dropped`` (no watermark re-opening), mirroring how an
event-time engine with a fixed lateness bound behaves. The reference's
only streaming machinery is the in-order incremental parse buffer
(prompture/extraction/streaming.py:272-297); this generalizes that
accumulate-and-emit-on-change loop to keyed windows.

This is a raw-actor operator by design (mutable per-bucket state is the
documented Dataset-API exception); the Dataset-expressible equivalent is
``windows.tumbling_window`` and the two are equality-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_window_actors(n_buckets: int, window_s: int, lateness_s: int = 0):
    """Create the bucket actors (driver-side)."""
    import ray

    @ray.remote(num_cpus=1)
    class WindowBucket:
        def __init__(self):
            self.open: dict = {}      # (key, window_start) -> [n, total]
            self.watermark = -np.inf
            self.late_dropped = 0

        def feed(self, keys: np.ndarray, ts: np.ndarray,
                 vals: np.ndarray) -> list[dict]:
            """Ingest one batch; returns windows closed by the advancing
            watermark."""
            starts = (ts // window_s) * window_s
            for k, s, v, t in zip(keys, starts, vals, ts):
                if t < self.watermark:
                    self.late_dropped += 1
                    continue
                st = self.open.setdefault((k, s), [0, 0.0])
                st[0] += 1
                st[1] += float(v)
            if len(ts):
                self.watermark = max(self.watermark,
                                     float(ts.max()) - lateness_s)
            return self._close()

        def _close(self) -> list[dict]:
            done = []
            for (k, s), (n, tot) in list(self.open.items()):
                if s + window_s <= self.watermark:
                    done.append({"key": k, "window_start": int(s),
                                 "n": n, "sum_value": tot})
                    del self.open[(k, s)]
            return done

        def flush(self) -> list[dict]:
            """End of stream: emit every remaining open window."""
            self.watermark = np.inf
            out = self._close()
            return out

        def stats(self) -> dict:
            return {"open_windows": len(self.open),
                    "late_dropped": self.late_dropped}

    return [WindowBucket.remote() for _ in range(n_buckets)]


def streaming_tumbling_window(ds, key_col: str, ts_col: str, value_col: str,
                              window: str = "1h", lateness: str = "0s",
                              n_buckets: int = 4) -> pd.DataFrame:
    """Run the streaming window over a Dataset fed in ts order.

    The input Dataset is globally sorted by ts first (the log-order
    precondition); each batch is routed to bucket actors by key hash.
    Results accumulate as windows CLOSE (streaming), plus a final flush.
    Returns a DataFrame (key, window_start, n, sum_value).
    """
    import ray
    from prompture_ray.functions.sketches import hash64

    window_s = int(pd.Timedelta(window).total_seconds())
    lateness_s = int(pd.Timedelta(lateness).total_seconds())
    actors = make_window_actors(n_buckets, window_s, lateness_s)

    results: list[dict] = []
    pending = []
    for b in ds.sort(ts_col).iter_batches(batch_size=8192,
                                          batch_format="pandas"):
        keys = b[key_col].to_numpy()
        ts = pd.to_datetime(b[ts_col]).astype("datetime64[ns]") \
            .astype("int64").to_numpy() // 10**9
        vals = b[value_col].to_numpy(dtype=np.float64)
        buckets = (hash64(keys) % np.uint64(n_buckets)).astype(np.int64)
        for i in range(n_buckets):
            m = buckets == i
            if m.any():
                pending.append(actors[i].feed.remote(keys[m], ts[m], vals[m]))
        # drain closed windows as they arrive (streaming consumption)
        if len(pending) >= n_buckets * 2:
            ready, pending = ray.wait(pending, num_returns=len(pending) // 2)
            for r in ray.get(ready):
                results.extend(r)
    for r in ray.get(pending):
        results.extend(r)
    for r in ray.get([a.flush.remote() for a in actors]):
        results.extend(r)
    df = pd.DataFrame(results,
                      columns=["key", "window_start", "n", "sum_value"])
    df["window"] = pd.to_datetime(df["window_start"], unit="s")
    return df.drop(columns=["window_start"]) \
             .sort_values(["key", "window"], ignore_index=True)
