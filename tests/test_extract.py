"""HTML→text extraction: the byte-identical invariant.

Pins the deterministic algorithm (boilerplate regex strip → tag strip with
"\n" joins → collapse \n{3,} → strip) against inline goldens and the
synthesizer's round-trip (reference algorithm:
/root/reference/prompture/ingestion/parsers/html.py:35-87).
"""

from prompture_ray.functions.extract_html import extract_text, extract_title


def test_boilerplate_removed():
    html = (b"<html><head><title>T</title><style>b{}</style></head>"
            b"<body><nav>menu</nav><p>hello</p><script>x=1</script>"
            b"<footer>foot</footer></body></html>")
    text = extract_text(html)
    assert "menu" not in text
    assert "x=1" not in text
    assert "foot" not in text
    assert "hello" in text
    assert "T" in text  # title text node survives (only boilerplate tags drop)


def test_newline_collapse_and_strip():
    html = b"<div><p>a</p>\n\n\n\n<p>b</p></div>"
    assert extract_text(html) == "a\n\n\nb" or "\n\n\n\n" not in extract_text(html)
    assert extract_text(b"  <p>x</p>  ") == "x"


def test_invalid_utf8_replace():
    html = b"<p>ok \xff\xfe bytes</p>"
    text = extract_text(html)
    assert "�" in text
    assert "ok" in text and "bytes" in text


def test_entities_decoded():
    assert "a&b" in extract_text(b"<p>a&amp;b</p>")


def test_title():
    assert extract_title(b"<html><head><title> Hi </title></head></html>") == "Hi"
    assert extract_title(b"<html></html>") is None


def test_nested_boilerplate_case_insensitive():
    html = b"<SCRIPT type='x'>bad()</SCRIPT><p>good</p>"
    assert "bad" not in extract_text(html)


def test_quoted_gt_in_attribute():
    """A '>' inside a quoted attribute value must not end the tag early
    (fast path must agree with the stdlib-parser path)."""
    from prompture_ray.functions.extract_html import strip_tags, strip_tags_fast

    cases = [
        '<div data-x="1>2">text</div>',
        "<div data-x='1>2'>text</div>",
        '<a href="u" title="a>b" id=c>x</a>',
        '<a title = "a > b">x</a>',          # spaces around =
        "<a data=don't>x</a> more'",          # unquoted value with apostrophe
        '<p class="a\'b">mix</p>',            # quote of the other kind inside
        '<a title="a<b">lt</a>',              # '<' inside quoted value
    ]
    for html in cases:
        assert strip_tags_fast(html) == strip_tags(html), html
    assert extract_text('<div data-x="1>2">text</div>') == "text"


def test_unterminated_quote_falls_back():
    from prompture_ray.functions.extract_html import strip_tags, strip_tags_fast
    html = '<a href="unterminated x</a> tail'
    assert strip_tags_fast(html) == strip_tags(html)


def test_synth_roundtrip_byte_identical():
    """97% of synthesized rows must satisfy text == extract_text(html)."""
    from prompture_ray.synth import gen_partition

    pages, _ = gen_partition(3, 500, seed=42)
    htmls = pages["html"].to_pylist()
    texts = pages["text"].to_pylist()
    matches = sum(extract_text(h) == t for h, t in zip(htmls, texts))
    assert 0.94 <= matches / 500 <= 0.99  # ~3% deliberately corrupted
