"""robots.txt compliance (stages/robots.py): parser group selection,
precedence (longest match, allow-wins ties), wildcards/anchors, the
vectorized flag stage."""
import pyarrow as pa

from prompture_ray.stages.robots import (parse_robots, robots_allowed)

ROBOTS_A = """
# comment
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*.pdf$
Disallow:
"""


def test_parse_group_selection():
    star = parse_robots(ROBOTS_A, "*")
    assert ("/private", False) in star and ("/private/ok", True) in star
    # precedence order: longest first
    assert star[0][0] in ("/private/ok", "/tmp/*.pdf$")
    special = parse_robots(ROBOTS_A, "SpecialBot")
    assert special == [("/", False)]
    assert parse_robots("", "*") == []
    # empty Disallow: value adds NO rule
    assert all(p != "" for p, _ in star)


def test_parse_allow_wins_ties():
    txt = "User-agent: *\nDisallow: /abc\nAllow: /abc\n"
    rules = parse_robots(txt, "*")
    assert rules[0] == ("/abc", True)  # allow first on equal length


def _flags(urls, robots, agent="*"):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(urls)), type=pa.int64()),
        "url": pa.array(urls, type=pa.string())}))
    df = robots_allowed(ds, "url", robots, agent=agent).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    return list(df["allowed"])


def test_robots_allowed_hand_checked(ray_session):
    robots = {"a.example": ROBOTS_A, "b.example":
              "User-agent: *\nDisallow: /\n"}
    urls = ["https://a.example/public/p",     # no rule -> allowed
            "https://a.example/private/x",    # /private -> blocked
            "https://a.example/private/ok/y",  # longer allow wins
            "https://a.example/tmp/f.pdf",    # wildcard+anchor blocked
            "https://a.example/tmp/f.pdfx",   # $ anchor -> NOT blocked
            "https://b.example/anything",     # blanket disallow
            "https://c.example/z",            # no robots -> allowed
            "not a url at all"]               # no host -> allowed
    assert _flags(urls, robots) == [True, False, True, False, True,
                                    False, True, True]


def test_robots_agent_specific_group(ray_session):
    robots = {"a.example": ROBOTS_A}
    # specialbot gets ITS group (blanket disallow), not the * group
    assert _flags(["https://a.example/public/p"], robots,
                  agent="specialbot") == [False]


def test_robots_host_case_and_root_path(ray_session):
    robots = {"A.Example": "User-agent: *\nDisallow: /\n"}
    assert _flags(["https://a.EXAMPLE", "https://a.example/"],
                  robots) == [False, False]
