"""Deterministic synthetic web_pages + warc_records generator.

Produces the Common-Crawl-style input table of BASELINE.json's
``input_hint``: ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)`` with seeded, controlled violation rates
(FIXTURES.md §1):

- ~1%   malformed urls (regex violations)
- ~0.5% duplicate urls (uniqueness violations)
- ~1%   out-of-range warc_ts, ~0.2% null warc_ts
- ~1%   invalid lang codes, ~0.5% null lang
- ~3%   text ≠ extract(html) (byte-identity violations)
- occasional invalid UTF-8 bytes in html (exercises errors="replace",
  reference prompture/ingestion/parsers/html.py:47)
- Zipfian domains + langs (skew fixture for salting)

``warc_records`` covers ~99% of urls — the missing 1% are the
referential-check violations.

Generation is partition-addressable: ``gen_partition(pid, n, seed)`` is a
pure function, so partitions can be produced in parallel (Ray tasks) and
the dataset is identical regardless of parallelism — the property that
makes resumable synthesis and oracle tests possible.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from prompture_ray.functions.extract_html import extract_text

VALID_LANGS = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru", "it", "nl"]
BAD_LANGS = ["xx", "EN", "", "q1"]
TS_LO = np.datetime64("2020-01-01T00:00:00", "us")
TS_HI = np.datetime64("2026-06-30T00:00:00", "us")
TS_BAD_OLD = np.datetime64("1999-06-15T12:00:00", "us")
TS_BAD_FUT = np.datetime64("2031-01-01T00:00:00", "us")

_CONS = "btkdlmnprsvz"
_VOW = "aeiou"


def _vocab(n: int = 500) -> list[str]:
    words = []
    i = 0
    while len(words) < n:
        w = ""
        x = i
        for _ in range(2 + (i % 3)):
            w += _CONS[x % len(_CONS)] + _VOW[(x // 7) % len(_VOW)]
            x = x * 31 + 17
        words.append(w)
        i += 1
    return words


_WORDS = np.array(_vocab(), dtype=object)
_DOMAINS = np.array(
    [f"site{i:03d}.example.{'com' if i % 3 else 'org'}" for i in range(200)],
    dtype=object,
)


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


_DOMAIN_P = _zipf_probs(len(_DOMAINS))
_LANG_P = _zipf_probs(len(VALID_LANGS), s=1.4)


def _paragraphs(rng: np.random.RandomState, n_words: int) -> list[str]:
    words = rng.choice(_WORDS, size=n_words)
    paras, i = [], 0
    while i < n_words:
        k = min(n_words - i, 12 + int(rng.randint(0, 24)))
        paras.append(" ".join(words[i:i + k]))
        i += k
    return paras


def _make_html(rng: np.random.RandomState, title: str, paras: list[str]) -> bytes:
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<html><head><title>" + title + "</title>"
        "<style>body { color: #222; }</style></head>"
        "<body><header>SiteHeader</header><nav>home | about | contact</nav>\n"
        + body +
        "\n<script>var x = 42;</script>"
        "<footer>copyright 2026</footer></body></html>"
    )
    raw = html.encode("utf-8")
    if rng.random_sample() < 0.02:  # invalid utf-8 injection inside a text node
        cut = raw.find(b"</p>")
        if cut > 0:
            raw = raw[:cut] + b" \xff\xfe" + raw[cut:]
    return raw


def gen_partition(pid: int, n: int, seed: int = 42,
                  words_scale: float = 1.0) -> tuple[pa.Table, pa.Table]:
    """Generate one partition → (web_pages table, warc_records table).

    ``words_scale`` multiplies the page-body length (bench uses > 1 for
    more realistic page sizes; unit tests keep the default)."""
    rng = np.random.RandomState(seed * 1_000_003 + pid)

    domains = rng.choice(_DOMAINS, size=n, p=_DOMAIN_P)
    path_ids = rng.randint(0, 10**9, size=n)
    urls = np.array(
        [f"https://{d}/p/{pid}-{i}-{x}" for i, (d, x) in enumerate(zip(domains, path_ids))],
        dtype=object,
    )
    # malformed urls (~1%)
    bad_url = rng.random_sample(n) < 0.01
    variants = np.array(["not a url", "htp://broken", "//missing-scheme", ""], dtype=object)
    urls[bad_url] = rng.choice(variants, size=bad_url.sum())
    # duplicate urls (~0.5%): copy the url of an earlier row in this partition
    dup = np.where(rng.random_sample(n) < 0.005)[0]
    dup = dup[dup > 0]
    for j in dup:
        urls[j] = urls[rng.randint(0, j)]

    # timestamps
    span_us = (TS_HI - TS_LO).astype("int64")
    ts = TS_LO + rng.randint(0, span_us, size=n).astype("timedelta64[us]")
    r = rng.random_sample(n)
    ts[r < 0.005] = TS_BAD_OLD
    ts[(r >= 0.005) & (r < 0.01)] = TS_BAD_FUT
    ts_null = rng.random_sample(n) < 0.002

    # langs (Zipfian; ~1% invalid, ~0.5% null)
    langs = rng.choice(np.array(VALID_LANGS, dtype=object), size=n, p=_LANG_P)
    r = rng.random_sample(n)
    bad_lang = r < 0.01
    langs[bad_lang] = rng.choice(np.array(BAD_LANGS, dtype=object), size=bad_lang.sum())
    lang_null = (r >= 0.01) & (r < 0.015)

    # html + text (log-normal length distribution)
    n_words = np.clip(np.exp(rng.normal(3.9, 0.6, size=n)) * words_scale,
                      10, 4000).astype(int)
    htmls: list[bytes] = []
    texts: list[str | None] = []
    corrupt = rng.random_sample(n)
    for i in range(n):
        title = f"Page {pid}-{i}"
        raw = _make_html(rng, title, _paragraphs(rng, int(n_words[i])))
        htmls.append(raw)
        t = extract_text(raw)
        if corrupt[i] < 0.02:
            t = t + " "                      # trailing-space corruption
        elif corrupt[i] < 0.03:
            t = t.split("\n", 1)[-1]         # dropped first line
        texts.append(t)

    pages = pa.table({
        "url": pa.array(list(urls), type=pa.string()),
        "warc_ts": pa.array(
            [None if ts_null[i] else ts[i].astype("datetime64[us]").item()
             for i in range(n)],
            type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(
            [None if lang_null[i] else langs[i] for i in range(n)],
            type=pa.string()),
    })

    # warc_records: one row per url, ~1% dropped → referential violations
    keep = rng.random_sample(n) >= 0.01
    idx = np.where(keep)[0]
    warc = pa.table({
        "warc_id": pa.array([f"warc-{pid:04d}{int(i):08d}" for i in idx],
                            type=pa.string()),
        "url": pa.array([urls[i] for i in idx], type=pa.string()),
        "fetch_ts": pa.array(
            [None if ts_null[i] else ts[i].astype("datetime64[us]").item()
             for i in idx],
            type=pa.timestamp("us")),
    })
    return pages, warc


def generate(out_dir: str | Path, n_rows: int, n_parts: int = 8,
             seed: int = 42, use_ray: bool | None = None,
             words_scale: float = 1.0) -> dict:
    """Write pages/part-{pid}.parquet + warc/part-{pid}.parquet under out_dir.

    Idempotent: skips generation if a _SYNTH_DONE marker with matching
    params exists. Uses Ray tasks per partition when a Ray session is up
    (partition-addressable generation parallelizes trivially).
    """
    out = Path(out_dir)
    marker = out / "_SYNTH_DONE"
    stamp = f"rows={n_rows} parts={n_parts} seed={seed} ws={words_scale} v=1"
    if marker.exists() and marker.read_text() == stamp:
        return {"out_dir": str(out), "cached": True,
                "pages": sorted(str(p) for p in (out / "pages").glob("*.parquet"))}
    (out / "pages").mkdir(parents=True, exist_ok=True)
    (out / "warc").mkdir(parents=True, exist_ok=True)

    per = [n_rows // n_parts + (1 if i < n_rows % n_parts else 0)
           for i in range(n_parts)]

    def _write(pid: int, n: int) -> None:
        pages, warc = gen_partition(pid, n, seed, words_scale)
        pq.write_table(pages, out / "pages" / f"part-{pid:05d}.parquet")
        pq.write_table(warc, out / "warc" / f"part-{pid:05d}.parquet")

    if use_ray is None:
        try:
            import ray
            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray and n_parts > 1:
        import ray

        @ray.remote(num_cpus=1)
        def _task(pid: int, n: int, o: str, s: int, ws: float) -> None:
            pages, warc = gen_partition(pid, n, s, ws)
            pq.write_table(pages, os.path.join(o, "pages", f"part-{pid:05d}.parquet"))
            pq.write_table(warc, os.path.join(o, "warc", f"part-{pid:05d}.parquet"))

        ray.get([_task.remote(pid, per[pid], str(out), seed, words_scale)
                 for pid in range(n_parts)])
    else:
        for pid in range(n_parts):
            _write(pid, per[pid])

    marker.write_text(stamp)
    return {"out_dir": str(out), "cached": False,
            "pages": sorted(str(p) for p in (out / "pages").glob("*.parquet"))}
