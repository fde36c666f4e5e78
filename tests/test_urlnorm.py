import numpy as np
import pyarrow as pa

from prompture_ray.functions.urlnorm import (canonicalize_url,
                                             canonicalize_urls,
                                             url_dedup_flags)


def test_canonicalize_scalar_cases():
    cases = [
        ("  HTTPS://WWW.Example.COM:443/A/7/?b=2&utm_source=x&a=1#s ",
         "https://example.com/A/7?a=1&b=2"),
        ("http://example.com:80", "http://example.com/"),
        ("http://example.com:8080/x/", "http://example.com:8080/x"),
        ("https://example.com/?utm_campaign=z", "https://example.com/"),
        ("not a url", "not a url"),
        ("ftp://Host.com/A/", "ftp://host.com/A"),
        ("https://e.com/a?x=1&x=0&ref=abc", "https://e.com/a?x=0&x=1"),
        ("", ""),
        ("https://e.com/a?&&", "https://e.com/a"),
        ("https://e.com/a#f?b=1", "https://e.com/a"),
        ("HTTP://E.com:443/", "http://e.com:443/"),  # https default only
    ]
    for url, want in cases:
        assert canonicalize_url(url) == want, url
    # options
    assert canonicalize_url("https://www.e.com/", strip_www=False) == \
        "https://www.e.com/"
    assert canonicalize_url("https://e.com/?utm_a=1",
                            strip_tracking=False) == \
        "https://e.com/?utm_a=1"


def test_canonicalize_vector_nulls():
    out = canonicalize_urls(pa.array([None, "https://A.com/"]))
    assert out.to_pylist() == ["", "https://a.com/"]


def test_url_dedup_flags(ray_session):
    import ray.data as rd
    urls = [
        "https://example.com/a",            # id 0  group A (min)
        "HTTPS://EXAMPLE.COM/a/",           # id 1  group A
        "https://www.example.com/a?utm_source=x",   # id 2  group A
        "https://example.com/b?x=1&y=2",    # id 3  group B (min)
        "https://example.com/b?y=2&x=1",    # id 4  group B
        "https://other.org/",               # id 5  singleton
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(urls)), type=pa.int64()),
        "url": pa.array(urls)}))
    expect_keep = {0: True, 1: False, 2: False, 3: True, 4: False,
                   5: True}
    for bmax in (20_000_000, 0):    # broadcast AND bucketed paths
        df = url_dedup_flags(ds, "url", "doc_id", broadcast_max=bmax) \
            .to_pandas().sort_values("id", ignore_index=True)
        got = {int(r["id"]): bool(r["keep"]) for _, r in df.iterrows()}
        assert got == expect_keep, (bmax, got)
        assert df["canonical_url"][0] == df["canonical_url"][1] == \
            df["canonical_url"][2] == "https://example.com/a"


def test_domain_blocklist_flags(ray_session):
    """Suffix matching is label-aligned (notspam.example does not match
    spam.example), ports strip, deep subdomains match, non-URLs and
    clean hosts pass, long entries match exact hosts."""
    import pyarrow as pa
    import ray.data as rd
    from prompture_ray.functions.urlnorm import domain_blocklist_flags

    cases = [
        ("https://spam.example/page", True),          # exact
        ("https://sub.spam.example/x", True),         # suffix
        ("https://SPAM.example:8080/y", True),        # case + port
        ("https://notspam.example/z", False),         # label alignment
        ("https://ok.example/a", False),
        ("https://deep.a.b.tracker.net/b", True),     # 5-label host
        ("not a url", False),
        ("https://a.b.c.d.e.f/q", True),              # long exact entry
    ]
    ds = rd.from_arrow(pa.table({
        "i": pa.array(range(len(cases)), type=pa.int64()),
        "url": [c[0] for c in cases]}))
    out = domain_blocklist_flags(
        ds, "url", ["spam.example", "tracker.net", "a.b.c.d.e.f"]) \
        .to_pandas().sort_values("i", ignore_index=True)
    assert list(out["blocked"]) == [c[1] for c in cases]
