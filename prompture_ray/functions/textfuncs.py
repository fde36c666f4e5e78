"""Scalar/batch text functions reimplementing the reference's normalizers,
parsers and filters as vectorized kernels (SURVEY §2.8).

Reference semantics:
- ``normalize_text``: casefold → strip punctuation → collapse whitespace
  (reference prompture/dataset/dedup.py:54-65 ``_normalise``)
- ``parse_boolean``: multilingual truthy/falsy sets + indicator fallback
  (reference prompture/extraction/tools.py:101-156)
- ``parse_shorthand_number``: currency prefixes, %, k/m/b suffixes
  (reference prompture/extraction/tools.py:206-265)
- ``as_list``: split on ``,;|`` (reference tools.py:159-178)
- ``strip_think_tags`` / ``clean_json_text``: fence/think stripping
  (reference tools.py:1023-1099)
- ``luhn_valid``: card-number checksum (reference security/redaction.py)
- PII patterns (reference prompture/security/redaction.py:63-126)
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# normalization (dedup key)
# ---------------------------------------------------------------------------
_PUNCT_RE = r"[^\w\s]"
_WS_RE = r"\s+"


def normalize_strings(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``_normalise``: casefold, strip punctuation, collapse
    whitespace, trim. Arrow kernels end to end."""
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, _PUNCT_RE, "")
    out = pc.replace_substring_regex(out, _WS_RE, " ")
    out = pc.utf8_trim_whitespace(out)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def normalize_text(s: str) -> str:
    """Scalar twin of normalize_strings (used by oracles/tests)."""
    s = s.casefold()
    s = re.sub(_PUNCT_RE, "", s)
    s = re.sub(_WS_RE, " ", s)
    return s.strip()


# ---------------------------------------------------------------------------
# boolean / number / list parsers
# ---------------------------------------------------------------------------
TRUTHY = {"true", "yes", "y", "1", "si", "sí", "oui", "ja", "da", "hai",
          "on", "enabled", "t"}
FALSY = {"false", "no", "n", "0", "non", "nein", "nee", "off", "disabled",
         "f", "none", "null"}
_TRUTHY_INDICATORS = ("yes", "true", "correct", "affirmative")


def parse_boolean(value) -> bool | None:
    if isinstance(value, bool):
        return value
    if value is None:
        return None
    s = str(value).strip().lower()
    if s in TRUTHY:
        return True
    if s in FALSY:
        return False
    return any(t in s for t in _TRUTHY_INDICATORS) or None


def parse_boolean_batch(col) -> pa.Array:
    lowered = pc.utf8_trim_whitespace(pc.utf8_lower(pc.cast(col, pa.string())))
    t = pc.is_in(lowered, value_set=pa.array(sorted(TRUTHY)))
    f = pc.is_in(lowered, value_set=pa.array(sorted(FALSY)))
    return pc.if_else(t, pa.scalar(True),
                      pc.if_else(f, pa.scalar(False), pa.scalar(None, pa.bool_())))


_CURRENCY_RE = re.compile(r"^[\s]*[$€£¥₹]")
_SHORTHAND_RE = re.compile(
    r"^\s*([$€£¥₹]?\s*-?[\d,]+(?:\.\d+)?)\s*([kKmMbB%]?)\s*$")
_SUFFIX = {"k": 1e3, "m": 1e6, "b": 1e9}


def parse_shorthand_number(value) -> float | None:
    """'$1,200' → 1200.0; '1.2k' → 1200.0; '12%' → 0.12."""
    if isinstance(value, (int, float)):
        return float(value)
    if value is None:
        return None
    m = _SHORTHAND_RE.match(str(value))
    if not m:
        return None
    num = float(re.sub(r"[$€£¥₹,\s]", "", m.group(1)))
    suf = m.group(2).lower()
    if suf == "%":
        return num / 100.0
    return num * _SUFFIX.get(suf, 1.0)


def as_list(value) -> list:
    """Scalar/str → list, splitting on , ; | (reference tools.py:159-178)."""
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [p.strip() for p in re.split(r"[,;|]", str(value)) if p.strip()]


# ---------------------------------------------------------------------------
# LLM-text cleanup (think tags, fences, first JSON span)
# ---------------------------------------------------------------------------
_THINK_RE = re.compile(r"<think>.*?</think>", re.DOTALL | re.IGNORECASE)
_FENCE_RE = re.compile(r"```(?:json|JSON)?\s*(.*?)```", re.DOTALL)


def strip_think_tags(text: str) -> str:
    return _THINK_RE.sub("", text).strip()


_FENCED_BLOCK_RE = re.compile(r"```(\w+)?\s*\n([\s\S]*?)```", re.MULTILINE)


def extract_fenced_blocks(text: str,
                          languages=None) -> list[tuple[str, str]]:
    """Every markdown-fenced code block as (language, content), in order
    (reference extract_fenced_blocks, code_extraction.py:52-80): language
    tag lowercased ('' when absent), body stripped, empty bodies dropped,
    optional language filter."""
    if not text:
        return []
    allowed = {l.lower() for l in languages} if languages is not None else None
    out = []
    for m in _FENCED_BLOCK_RE.finditer(text):
        lang = (m.group(1) or "").lower()
        body = m.group(2).strip()
        if not body:
            continue
        if allowed is not None and lang not in allowed:
            continue
        out.append((lang, body))
    return out


def fenced_block_batch(col, language: str | None = None) -> "pa.Array":
    """First fenced block body per row (filtered by language when given),
    null when none — the columnar form for code-bearing text columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    langs = [language] if language else None
    out = []
    for v in col.to_pylist():
        blocks = extract_fenced_blocks(v or "", languages=langs)
        out.append(blocks[0][1] if blocks else None)
    return pa.array(out, type=pa.string())


def clean_json_text(text: str) -> str:
    """Strip think tags + markdown fences, take the first {...} span."""
    text = strip_think_tags(text)
    m = _FENCE_RE.search(text)
    if m:
        text = m.group(1)
    start = text.find("{")
    if start >= 0:
        depth = 0
        for i in range(start, len(text)):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    return text[start:i + 1]
    return text.strip()


def strip_think_batch(col) -> pa.Array:
    return pc.replace_substring_regex(col, r"(?s)<think>.*?</think>", "")


# ---------------------------------------------------------------------------
# Luhn + PII patterns
# ---------------------------------------------------------------------------
def luhn_valid(number: str) -> bool:
    digits = [int(d) for d in re.sub(r"\D", "", number)]
    if len(digits) < 13:  # reference redaction.py:144: <13 is never a card
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


# Category set and shapes follow the reference's PIIRedactor
# (reference prompture/security/redaction.py:46-131: EMAIL PHONE
# CREDIT_CARD SSN IBAN IPV4 IPV6 API_KEY URL_CREDENTIALS, with
# Luhn-gated card candidates and length-gated IBANs). Patterns here are
# RE2-safe (no lookarounds — pyarrow's regex kernels are RE2), so word
# boundaries replace the reference's lookbehind guards. INSERTION ORDER
# IS REDACTION ORDER: specific/high-precision kinds run before the loose
# phone pattern so e.g. an SSN or IBAN is not half-eaten as a "phone".
PII_PATTERNS = {
    "url_creds": r"(?i)\b(?:https?|ftp|s3|ssh)://[^\s:/@]+:[^\s/@]+@[^\s]+",
    "api_key": (
        r"\b(?:sk-ant-[A-Za-z0-9_-]{20,}|sk-[A-Za-z0-9_-]{20,}"
        r"|AIza[0-9A-Za-z_-]{30,}|(?:AKIA|ASIA)[0-9A-Z]{16}"
        r"|gh[po]_[A-Za-z0-9]{30,}|xox[baprs]-[A-Za-z0-9-]{10,}"
        r"|(?:sk|pk|rk)_(?:live|test)_[A-Za-z0-9]{20,})\b"
    ),
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b(?:\d[ -]?){12,18}\d\b",  # candidate only — Luhn-gated
    "iban": r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv6": (r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
             r"|\b(?:[0-9A-Fa-f]{1,4}:){1,7}:(?:[0-9A-Fa-f]{1,4})?"),
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}

_CARD_CANDIDATE = re.compile(PII_PATTERNS["card"])


def _redact_cards_gated(col, token: str) -> "pa.Array":
    """Replace only Luhn-VALID card candidates (reference redaction.py:134
    — a 13-19-digit run failing Luhn is NOT a card and must survive).
    Vectorized prefilter: only rows containing a candidate pay the
    per-row re.sub; clean rows pass through untouched."""
    has = pc.match_substring_regex(col, PII_PATTERNS["card"])
    if not pc.any(pc.fill_null(has, False)).as_py():
        return col if not isinstance(col, pa.ChunkedArray) else col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()

    def sub_row(s):
        return _CARD_CANDIDATE.sub(
            lambda m: token if luhn_valid(m.group()) else m.group(), s)

    has_np = pc.fill_null(has, False).to_numpy(zero_copy_only=False)
    vals = col.to_pylist()
    out = [sub_row(v) if (h and v is not None) else v
           for v, h in zip(vals, has_np)]
    return pa.array(out, type=pa.string())


def redact_batch(col, patterns: dict[str, str] | None = None,
                 token: str = "[REDACTED:{kind}]") -> pa.Array:
    """Vectorized PII redaction: chained replace_substring_regex in
    PII_PATTERNS order, with the card kind Luhn-gated."""
    out = col
    for kind, pat in (patterns or PII_PATTERNS).items():
        if kind == "card":
            out = _redact_cards_gated(out, token.format(kind=kind))
        else:
            out = pc.replace_substring_regex(out, pat, token.format(kind=kind))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def redact_with_counts(col, patterns: dict[str, str] | None = None,
                       token: str = "[REDACTED:{kind}]"
                       ) -> tuple[pa.Array, dict[str, pa.Array]]:
    """Like ``redact_batch`` but also returns per-kind match counts
    (the reference's RedactionResult.counts, redaction.py:190-205).
    Counts are of what was actually REDACTED at each chain step (i.e.
    computed on the text after earlier kinds were replaced)."""
    out = col
    counts: dict[str, pa.Array] = {}
    for kind, pat in (patterns or PII_PATTERNS).items():
        if kind == "card":
            # candidates seen minus candidates surviving the Luhn gate
            before = pc.count_substring_regex(out, pat)
            out = _redact_cards_gated(out, token.format(kind=kind))
            after = pc.count_substring_regex(out, pat)
            counts[kind] = pc.cast(pc.subtract(before, after), pa.int64())
        else:
            counts[kind] = pc.cast(pc.count_substring_regex(out, pat),
                                   pa.int64())
            out = pc.replace_substring_regex(out, pat, token.format(kind=kind))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    counts = {k: v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
              for k, v in counts.items()}
    return out, counts


# ---------------------------------------------------------------------------
# marker scan (injection / refusal detection)
# ---------------------------------------------------------------------------
INJECTION_MARKERS = [
    "ignore previous instructions", "ignore all previous instructions",
    "disregard the above", "system prompt", "you are now",
    "forget your instructions", "new instructions:",
]
REFUSAL_MARKERS = [
    "i cannot help with", "i can't help with", "i'm unable to",
    "as an ai", "i cannot assist", "no puedo ayudar",
]


def marker_scan_batch(col, markers: list[str]) -> pa.Array:
    """True where any marker phrase occurs (case-normalized substring scan,
    longest-first like the reference, prompture/security/injection.py:371-373).
    Vectorized as an alternation regex over the normalized column."""
    lowered = pc.utf8_lower(col)
    pat = "|".join(re.escape(m) for m in
                   sorted(markers, key=len, reverse=True))
    hit = pc.match_substring_regex(lowered, pat)
    if isinstance(hit, pa.ChunkedArray):
        hit = hit.combine_chunks()
    return hit


# ---------------------------------------------------------------------------
# truncated-JSON repair (reference streaming.py:80-180 parse_partial_json)
# ---------------------------------------------------------------------------
def parse_partial_json(text: str):
    """Parse possibly-truncated JSON: bracket-stack scan, close unclosed
    containers and retry, then trim to the last complete value boundary.
    Returns a Python object or None (a failed parse is a verdict, not an
    exception — SURVEY §4 row-level fallback semantics)."""
    import json as _json

    if not text:
        return None
    text = text.strip()
    try:
        return _json.loads(text)
    except _json.JSONDecodeError:
        pass

    # bracket-stack scan (ignoring string contents / escapes)
    stack = []
    in_str = False
    esc = False
    last_complete = -1
    for i, ch in enumerate(text):
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch in "{[":
            stack.append(ch)
        elif ch in "}]":
            if stack:
                stack.pop()
            if not stack:
                last_complete = i
    # close-and-retry
    candidate = text
    if in_str:
        candidate += '"'
    candidate = candidate.rstrip()
    if candidate.endswith((",", ":")):
        candidate = candidate[:-1]
    closers = "".join("}" if c == "{" else "]" for c in reversed(stack))
    try:
        return _json.loads(candidate + closers)
    except _json.JSONDecodeError:
        pass
    # drop a dangling object key ('{"a": 1, "b":' → '{"a": 1') and retry
    trimmed = re.sub(r',?\s*"[^"]*"?\s*:?\s*$', "", candidate)
    if trimmed != candidate:
        try:
            return _json.loads(trimmed + closers)
        except _json.JSONDecodeError:
            pass
    # trim-to-boundary retry
    if last_complete >= 0:
        try:
            return _json.loads(text[: last_complete + 1])
        except _json.JSONDecodeError:
            pass
    return None


_TOON_PREFIXES = ("here is the toon data:", "here's the toon format:",
                  "toon output:", "result:")
_TOON_ARRAY_RE = re.compile(r"^([^\n:]+?\[\d+\]:)([^\n]+)$", re.MULTILINE)


def clean_toon_text(text: str) -> str:
    """Extract TOON content from a model response (reference
    clean_toon_text, extraction/tools.py): strip think tags, markdown
    fences (```toon / ```), chatty lead-ins, and normalize
    semicolon-separated inline arrays to commas."""
    cleaned = strip_think_tags(text or "").strip()
    if cleaned.startswith("```toon"):
        cleaned = cleaned[len("```toon"):]
    elif cleaned.startswith("```"):
        cleaned = cleaned[3:]
    if cleaned.endswith("```"):
        cleaned = cleaned[:-3]
    cleaned = cleaned.strip()
    low = cleaned.lower()
    for p in _TOON_PREFIXES:
        if low.startswith(p):
            cleaned = cleaned[len(p):].strip()
            break

    def _norm(m: "re.Match") -> str:
        head, vals = m.group(1), m.group(2)
        if ";" not in vals:
            return m.group(0)
        return head + ",".join(v.strip() for v in vals.split(";")
                               if v.strip())

    return _TOON_ARRAY_RE.sub(_norm, cleaned)
