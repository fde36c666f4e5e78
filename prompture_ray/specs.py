"""Declarative check specs and validation suites.

The spec vocabulary descends from the reference's field-definition registry
(reference: prompture/extraction/fields.py:64-325 — ``{type, nullable,
enum, default}``), its structural spec validator
(prompture/extraction/tools.py:887-919) and the JSON-Schema constraints its
test suites exercise (enum, minimum/maximum, nullable unions —
reference specs/schema_validation.json). A suite file is the descendant of
the reference spec format documented at prompture/cli/runner.py:14-24:
``{meta, checks[...]}`` instead of ``{meta, models, tests}``.

Row-level check kinds (evaluated vectorized inside ``map_batches``):
  not_null, type, regex, enum, range, length, extract_match, custom_expr
Table-level check kinds (need a shuffle or an aggregate pass):
  unique, referential, stats (sketches + drift)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

ROW_KINDS = {"not_null", "type", "regex", "enum", "range", "length",
             "extract_match", "json_schema"}
TABLE_KINDS = {"unique", "referential", "stats"}
KINDS = ROW_KINDS | TABLE_KINDS

# -- user-extension surface (mirrors the reference's register_field /
#    PairPredicate hooks, prompture/extraction/fields.py:403-442 and
#    prompture/dataset/filters.py:30): a custom row-level check kind is a
#    callable (CheckSpec, pa.Table) -> BooleanArray pass-mask, registered
#    under a kind name usable in suite JSON.
import threading as _threading

_CUSTOM_KINDS: dict = {}
_registry_lock = _threading.Lock()


def register_check_kind(name: str, kernel) -> None:
    """Register a custom row-level check kind (thread-safe, like the
    reference's registry lock, fields.py:330-332)."""
    with _registry_lock:
        if name in ROW_KINDS or name in TABLE_KINDS:
            raise ValueError(f"cannot override built-in kind {name!r}")
        _CUSTOM_KINDS[name] = kernel


def custom_kernel(name: str):
    return _CUSTOM_KINDS.get(name)


def reset_check_registry() -> None:
    """Drop all custom kinds (reference reset_registry, fields.py:595-610)."""
    with _registry_lock:
        _CUSTOM_KINDS.clear()


class SpecError(ValueError):
    pass


@dataclass(frozen=True)
class CheckSpec:
    """One declarative constraint over one column.

    Mirrors the reference field definition shape ``{type, nullable, enum,
    default}`` (fields.py:64-325) extended with regex/range/length per the
    JSON-Schema constraints the reference validates against
    (tools.py:273-392).
    """

    id: str
    column: str
    kind: str
    # kind-specific params
    dtype: str | None = None            # type: expected arrow type name
    nullable: bool = True               # not_null / type: nulls allowed?
    pattern: str | None = None          # regex
    values: tuple[str, ...] | None = None  # enum
    case_insensitive: bool = False      # enum: normalize before membership
    min: Any = None                     # range / length lower bound
    max: Any = None                     # range / length upper bound
    source: str | None = None           # extract_match: html source column
    ref_table: str | None = None        # referential
    ref_column: str | None = None       # referential
    sketches: tuple[str, ...] = ()      # stats: hll/kll/countmin/topk
    drift_baseline: str | None = None   # stats: path to pinned baseline
    params: dict = field(default_factory=dict, hash=False, compare=False)

    def __post_init__(self) -> None:
        if self.kind not in KINDS and self.kind not in _CUSTOM_KINDS:
            raise SpecError(f"check {self.id!r}: unknown kind {self.kind!r}")
        if not self.id or not isinstance(self.id, str):
            raise SpecError("check id must be a non-empty string")
        if self.kind != "referential" and not self.column:
            raise SpecError(f"check {self.id!r}: column required")
        if self.kind == "regex" and not self.pattern:
            raise SpecError(f"check {self.id!r}: regex requires pattern")
        if self.kind == "enum" and not self.values:
            raise SpecError(f"check {self.id!r}: enum requires values")
        if self.kind == "range" and self.min is None and self.max is None:
            raise SpecError(f"check {self.id!r}: range requires min or max")
        if self.kind == "extract_match" and not self.source:
            raise SpecError(f"check {self.id!r}: extract_match requires source")
        if self.kind == "referential" and not (self.ref_table and self.ref_column):
            raise SpecError(f"check {self.id!r}: referential requires ref_table+ref_column")
        if self.kind == "json_schema":
            if not isinstance(self.params.get("schema"), dict):
                raise SpecError(f"check {self.id!r}: json_schema requires a "
                                "'schema' dict")
            # fail at spec time, not per batch, on unsupported vocabulary
            from prompture_ray.stages.json_schema import compile_schema
            compile_schema(self.params["schema"])

    @property
    def is_row_level(self) -> bool:
        return self.kind in ROW_KINDS or self.kind in _CUSTOM_KINDS

    def reason(self, detail: str | None = None) -> str:
        """snake_case "<kind>:<detail>" reason tag (style of FilterDecision.drop,
        reference prompture/dataset/filters.py:46-52)."""
        return f"{self.kind}:{detail or self.column}"

    @classmethod
    def from_dict(cls, d: dict) -> "CheckSpec":
        known = {
            "id", "column", "kind", "dtype", "nullable", "pattern", "values",
            "case_insensitive", "min", "max", "source", "ref_table",
            "ref_column", "sketches", "drift_baseline",
        }
        kwargs = {k: v for k, v in d.items() if k in known}
        if "values" in kwargs and kwargs["values"] is not None:
            kwargs["values"] = tuple(kwargs["values"])
        if "sketches" in kwargs and kwargs["sketches"] is not None:
            kwargs["sketches"] = tuple(kwargs["sketches"])
        extra = {k: v for k, v in d.items() if k not in known}
        return cls(params=extra, **kwargs)


@dataclass
class Suite:
    """A validation suite: metadata + ordered list of checks.

    Order matters for first-failure-wins reason assignment, mirroring the
    reference's short-circuit predicate chain (QualityFilter.evaluate,
    reference prompture/dataset/filters.py:229-255).
    """

    meta: dict
    checks: list[CheckSpec]

    @property
    def row_checks(self) -> list[CheckSpec]:
        return [c for c in self.checks if c.is_row_level]

    @property
    def table_checks(self) -> list[CheckSpec]:
        return [c for c in self.checks if not c.is_row_level]

    def check(self, check_id: str) -> CheckSpec:
        for c in self.checks:
            if c.id == check_id:
                return c
        raise KeyError(check_id)

    @classmethod
    def from_dict(cls, d: dict) -> "Suite":
        checks = [CheckSpec.from_dict(c) for c in d.get("checks", [])]
        ids = [c.id for c in checks]
        if len(set(ids)) != len(ids):
            dupes = sorted({i for i in ids if ids.count(i) > 1})
            raise SpecError(f"duplicate check ids: {dupes}")
        return cls(meta=dict(d.get("meta", {})), checks=checks)

    def to_dict(self) -> dict:
        out_checks = []
        for c in self.checks:
            d = {"id": c.id, "column": c.column, "kind": c.kind}
            for k in ("dtype", "pattern", "source", "ref_table", "ref_column",
                      "drift_baseline"):
                v = getattr(c, k)
                if v is not None:
                    d[k] = v
            if c.values:
                d["values"] = list(c.values)
            if c.sketches:
                d["sketches"] = list(c.sketches)
            if c.min is not None:
                d["min"] = c.min
            if c.max is not None:
                d["max"] = c.max
            if not c.nullable:
                d["nullable"] = False
            if c.case_insensitive:
                d["case_insensitive"] = True
            d.update(c.params)
            out_checks.append(d)
        return {"meta": self.meta, "checks": out_checks}


_TEMPLATE_VALUES = {
    # pinned for determinism (reference substitutes live values at read
    # time, fields.py:24-56; a distributed run pins them per-run instead)
    "current_year": "2026",
    "current_date": "2026-08-17",
}


def substitute_templates(obj, values: dict | None = None):
    """Recursively substitute ``{{var}}`` templates in a suite dict
    (reference template substitution, prompture/extraction/fields.py:24-56,
    with pinned values so every worker sees identical specs)."""
    vals = {**_TEMPLATE_VALUES, **(values or {})}
    if isinstance(obj, str):
        out = obj
        for k, v in vals.items():
            out = out.replace("{{" + k + "}}", str(v))
        return out
    if isinstance(obj, dict):
        return {k: substitute_templates(v, values) for k, v in obj.items()}
    if isinstance(obj, list):
        return [substitute_templates(v, values) for v in obj]
    return obj


#: JSON Schema for suite files themselves — validated by the engine's own
#: compiled validator (stages/json_schema.py), the dogfooded analog of the
#: reference's structural spec validator (tools.py:887-919).
SUITE_SCHEMA = {
    "type": "object",
    "properties": {
        "meta": {"type": "object"},
        "checks": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "properties": {
                    "id": {"type": "string", "minLength": 1},
                    "column": {"type": "string"},
                    "kind": {"type": "string", "minLength": 1},
                    "nullable": {"type": "boolean"},
                    "values": {"type": "array", "items": {"type": "string"}},
                    "sketches": {"type": "array",
                                 "items": {"type": "string"}},
                },
                "required": ["id", "kind"],
            },
        },
    },
    "required": ["checks"],
}


def validate_suite_dict(raw: dict) -> None:
    """Structural validation of a suite dict before CheckSpec parsing —
    errors carry the failing JSON path."""
    from prompture_ray.stages.json_schema import compile_schema
    errs = compile_schema(SUITE_SCHEMA)(raw)
    if errs:
        raise SpecError(f"invalid suite file: {', '.join(errs[:8])}")


def load_suite(path: str | Path, template_values: dict | None = None) -> Suite:
    """Load a suite JSON file (driver-side, config time)."""
    with open(path) as f:
        raw = json.load(f)
    raw = substitute_templates(raw, template_values)
    validate_suite_dict(raw)
    return Suite.from_dict(raw)


def load_plugins(module_paths) -> list[str]:
    """Import plugin modules by dotted path (reference driver/plugin
    registry discovery, the entry-point pattern without packaging):
    each module registers its custom check kinds / chunkers at import
    time (via ``register_check_kind`` / ``CHUNKERS``). Returns the
    loaded module names; unknown modules raise ImportError."""
    import importlib
    loaded = []
    for mp in ([module_paths] if isinstance(module_paths, str)
               else module_paths):
        importlib.import_module(mp)
        loaded.append(mp)
    return loaded


def default_webpages_suite(ref_warc: str | None = None) -> Suite:
    """The built-in suite for the Common-Crawl-style web_pages table
    (BASELINE.json input_hint): url/warc_ts/html/text/lang."""
    checks: list[dict] = [
        {"id": "url-notnull", "column": "url", "kind": "not_null"},
        {"id": "url-regex", "column": "url", "kind": "regex",
         "pattern": r"^https?://[^ ]+$"},
        {"id": "url-unique", "column": "url", "kind": "unique"},
        {"id": "ts-range", "column": "warc_ts", "kind": "range",
         "min": "2008-01-01T00:00:00", "max": "2026-08-17T00:00:00",
         "nullable": False},
        {"id": "lang-enum", "column": "lang", "kind": "enum",
         "values": ["en", "de", "fr", "es", "zh", "ja", "pt", "ru", "it", "nl"],
         "nullable": False},
        {"id": "text-extract", "column": "text", "kind": "extract_match",
         "source": "html"},
        {"id": "len-stats", "column": "text", "kind": "stats",
         "sketches": ["kll"]},
        {"id": "lang-stats", "column": "lang", "kind": "stats",
         "sketches": ["countmin", "topk"]},
        {"id": "url-card", "column": "url", "kind": "stats",
         "sketches": ["hll"]},
    ]
    if ref_warc:
        checks.append({"id": "url-ref", "column": "url", "kind": "referential",
                       "ref_table": ref_warc, "ref_column": "url"})
    return Suite.from_dict({
        "meta": {"project": "prompture_ray", "suite": "webpages_v1",
                 "version": "1.0"},
        "checks": checks,
    })
