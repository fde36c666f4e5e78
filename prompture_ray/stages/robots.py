"""robots.txt compliance filtering (RFC 9309 subset) — the crawl-
politeness gate of a web-curation pipeline (beyond the reference, whose
only URL surface is the url-regex validator,
prompture/validation/fields.py; corpus builders like CCNet/RefinedWeb
filter fetched pages against the host's robots rules before keeping
them).

Semantics (documented subset of RFC 9309):
- group selection: the group whose ``User-agent`` token equals the
  requested agent case-insensitively wins; otherwise the ``*`` group;
  no group -> everything allowed. Multiple UA lines may head one group.
- rule matching: a rule pattern matches path PREFIXES; ``*`` matches
  any char run, a trailing ``$`` anchors the end. Among matching rules
  the LONGEST pattern (character count, the RFC's octet-count proxy)
  wins; equal length -> Allow wins. No matching rule -> allowed.
- empty ``Disallow:`` value = no rule (classic allow-all idiom).

Scale shape: robots files are a per-HOST small side (one fetch per
host) — parsed ONCE on the driver and broadcast via ``ray.put``; each
batch pays one Arrow regex pass to split URLs into host + path, a
pandas groupby over the hosts present in the batch, and per host a
rule-count-bounded sequence of VECTORIZED prefix/regex matches over
that host's path array (first decision in precedence order sticks).
URLs never shuffle; no per-row Python.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SPLIT_RE = (r"^[A-Za-z][A-Za-z0-9+.\-]*://"
             r"(?P<host>[^/?#]*)(?P<rest>[^#]*)")


def parse_robots(robots_txt: str, agent: str = "*"):
    """Rules ``[(pattern, allow)]`` of the group governing ``agent``,
    in PRECEDENCE order (pattern length desc, Allow before Disallow on
    ties) — ready for first-match-wins evaluation."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    saw_rule = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if saw_rule:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, saw_rule = [], [], False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            saw_rule = True
            if value:  # empty Disallow = allow-all idiom, no rule
                cur_rules.append((value, field == "allow"))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    agent = agent.lower()
    chosen = None
    for agents, rules in groups:
        if agent in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    if chosen is None:
        return []
    return sorted(chosen, key=lambda r: (-len(r[0]), not r[1]))


def _matcher(pattern: str):
    """('prefix', p) for plain prefixes, ('regex', compiled) when the
    pattern uses ``*`` or a ``$`` anchor."""
    if "*" not in pattern and not pattern.endswith("$"):
        return ("prefix", pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return ("regex", re.compile(rx + ("$" if anchored else "")))


def robots_allowed(ds, url_col: str, robots_by_host: dict,
                   agent: str = "*", out_col: str = "allowed"):
    """Append a boolean ``out_col``: may ``agent`` fetch this URL under
    its host's robots.txt? Hosts are matched case-insensitively (port
    included as written); a host absent from ``robots_by_host`` is
    fully allowed, as are non-URL strings (no host to govern them)."""
    import ray

    parsed = {h.lower(): [( _matcher(p), allow)
                          for p, allow in parse_robots(txt, agent)]
              for h, txt in robots_by_host.items()}
    ref = ray.put(parsed)

    def per_batch(t: pa.Table) -> pa.Table:
        rules_by_host = ray.get(ref)
        urls = pc.fill_null(
            t[url_col].combine_chunks().cast(pa.string()), "")
        m = pc.extract_regex(urls, _SPLIT_RE)
        ok = pc.is_valid(m)
        host = pc.if_else(ok, pc.utf8_lower(
            pc.struct_field(m, "host")), pa.scalar("", type=pa.string()))
        path = pc.if_else(ok, pc.struct_field(m, "rest"),
                          pa.scalar("", type=pa.string()))
        path = pc.if_else(pc.equal(path, ""), "/", path)
        allowed = np.ones(len(t), dtype=bool)
        hosts = host.to_numpy(zero_copy_only=False)
        paths = pd.Series(path.to_numpy(zero_copy_only=False))
        for h, idx in pd.Series(np.arange(len(t))) \
                .groupby(hosts, sort=False):
            rules = rules_by_host.get(h)
            if not rules:
                continue
            sub = paths.iloc[idx.to_numpy()]
            decided = np.zeros(len(sub), dtype=bool)
            verdict = np.ones(len(sub), dtype=bool)
            for (kind, pat), allow in rules:  # precedence order
                if kind == "prefix":
                    hit = sub.str.startswith(pat).to_numpy()
                else:
                    hit = sub.str.match(pat).to_numpy()
                take = hit & ~decided
                verdict[take] = allow
                decided |= take
            allowed[idx.to_numpy()] = verdict
        return t.append_column(out_col, pa.array(allowed,
                                                 type=pa.bool_()))

    return ds.map_batches(per_batch, batch_format="pyarrow")
