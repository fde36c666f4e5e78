"""Sitemap XML source round trips (sources/sitemap.py)."""

import gzip

import pytest


def test_urlset_roundtrip_plain_and_gz():
    from prompture_ray.sources.sitemap import (build_sitemap,
                                               parse_sitemap)
    entries = [
        {"loc": "http://a.example/p?q=1&r=<2>", "lastmod": "2024-01-02",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "http://b.example/", "lastmod": None,
         "changefreq": None, "priority": None},
    ]
    for compress in (False, True):
        blob = build_sitemap(entries, compress=compress)
        assert (blob[:2] == b"\x1f\x8b") == compress
        out = parse_sitemap(blob)
        assert out["kind"] == "urlset"
        assert out["entries"] == entries


def test_sitemapindex_roundtrip():
    from prompture_ray.sources.sitemap import (build_sitemap_index,
                                               parse_sitemap)
    maps = [{"loc": "http://x.example/sitemap1.xml.gz",
             "lastmod": "2023-12-31"},
            {"loc": "http://x.example/sitemap2.xml.gz",
             "lastmod": None}]
    out = parse_sitemap(build_sitemap_index(maps))
    assert out["kind"] == "sitemapindex"
    got = [{"loc": e["loc"], "lastmod": e["lastmod"]}
           for e in out["entries"]]
    assert got == maps


def test_namespace_tolerance_and_bad_root():
    from prompture_ray.sources.sitemap import (build_sitemap,
                                               parse_sitemap)
    noname = build_sitemap([{"loc": "http://n.example/"}],
                           namespace="")
    # namespace="" emits xmlns="" — still parses by local name
    assert parse_sitemap(noname)["entries"][0]["loc"] \
        == "http://n.example/"
    with pytest.raises(ValueError, match="sitemap root"):
        parse_sitemap(b"<html><body>nope</body></html>")


def test_read_sitemaps_dataset(ray_session, tmp_path):
    from prompture_ray.sources.sitemap import (build_sitemap,
                                               read_sitemaps)
    for i in range(3):
        entries = [{"loc": f"http://s{i}.example/p{j}",
                    "lastmod": f"2024-02-0{j + 1}"}
                   for j in range(4)]
        suffix = ".xml.gz" if i % 2 else ".xml"
        (tmp_path / f"sm{i}{suffix}").write_bytes(
            build_sitemap(entries, compress=bool(i % 2)))
    out = read_sitemaps(str(tmp_path)).to_pandas() \
        .sort_values("loc").reset_index(drop=True)
    assert len(out) == 12
    assert (out["kind"] == "urlset").all()
    assert out["loc"].iloc[0] == "http://s0.example/p0"
    assert out["lastmod"].iloc[-1] == "2024-02-04"
    assert out["priority"].isna().all()
