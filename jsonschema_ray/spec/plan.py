"""CheckPlan: the serializable compiled-rules artifact.

The analog of a compiled Blaze ``Template`` — data, not code — which
the reference serializes to versioned JSON for cross-run reuse
(``jsonschema compile`` → ``validate --template``; see
``/root/reference/vendor/blaze/src/evaluator/include/sourcemeta/blaze/evaluator.h:38-52``
and ``src/command_validate.cc:47-64``). A CheckPlan is compiled once on
the driver, shipped to validator actors as plain data, and hashed for
checkpoint lineage (``state/manifest.py``).

Rule kinds and their execution strategy (SURVEY.md §7.1):

- ``predicate`` — row-local, span- or doc-scope; vectorized kernels via
  ``spec/predicates.py`` inside ``map_batches`` (no shuffle).
- ``monotonic`` — span-sequence check (offset strictly increasing within
  a doc): windowed diff over flattened span arrays, still row-local.
- ``unique`` — dataset-scope key uniqueness: per-block partial counts
  then a small groupby shuffle (the ``uniqueItems`` analog lifted to
  dataset scope).
- ``ref`` — referential check against a side catalog: broadcast key-set
  membership (small side) or hash anti-join (large side).
- ``stats`` — column profile bounds (count / null-rate / min / max /
  HLL-distinct) via mergeable per-block partials.
- ``drift`` — t-digest quantile comparison against a baseline profile.

Rule-filtering mirrors the reference's lint surface: ``--only`` /
``--exclude`` / per-rule disable (``/root/reference/src/command_lint.cc:305-342``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field as dc_field
from typing import Any

PLAN_VERSION = 1  # analog of Blaze's Template JSON_VERSION (evaluator.h:47)

SPAN_KINDS = ["text", "image", "audio", "table"]
TEXT_KIND = "text"


@dataclass
class Rule:
    rule_id: str
    kind: str = "predicate"            # predicate | monotonic | unique | ref | stats | drift
    scope: str = "span"                # span | doc (for predicate rules)
    when: dict[str, Any] | None = None  # guard predicate (null → always applies)
    check: dict[str, Any] | None = None  # the asserted predicate (predicate rules)
    params: dict[str, Any] = dc_field(default_factory=dict)  # kind-specific
    message: str = ""
    severity: str = "error"            # error | warning
    enabled: bool = True

    def to_json(self) -> dict[str, Any]:
        return {
            "rule_id": self.rule_id, "kind": self.kind, "scope": self.scope,
            "when": self.when, "check": self.check, "params": self.params,
            "message": self.message, "severity": self.severity,
            "enabled": self.enabled,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Rule":
        return Rule(
            rule_id=d["rule_id"], kind=d.get("kind", "predicate"),
            scope=d.get("scope", "span"), when=d.get("when"),
            check=d.get("check"), params=d.get("params", {}),
            message=d.get("message", ""), severity=d.get("severity", "error"),
            enabled=d.get("enabled", True),
        )


@dataclass
class CheckPlan:
    rules: list[Rule]
    mode: str = "exhaustive"  # exhaustive (violation rows) | fast (verdict only),
                              # the --fast split (compiler.h:84)
    version: int = PLAN_VERSION

    def filtered(self, only: list[str] | None = None,
                 exclude: list[str] | None = None) -> "CheckPlan":
        rules = [r for r in self.rules if r.enabled]
        if only:
            rules = [r for r in rules if r.rule_id in only]
        if exclude:
            rules = [r for r in rules if r.rule_id not in exclude]
        return CheckPlan(rules=rules, mode=self.mode, version=self.version)

    def rules_of_kind(self, *kinds: str) -> list[Rule]:
        return [r for r in self.rules if r.kind in kinds]

    def to_json(self) -> dict[str, Any]:
        return {"version": self.version, "mode": self.mode,
                "rules": [r.to_json() for r in self.rules]}

    def dumps(self) -> str:
        return json.dumps(self.to_json(), sort_keys=True, separators=(",", ":"))

    def plan_hash(self) -> str:
        """Stable content hash — keys checkpoint lineage manifests."""
        return hashlib.sha256(self.dumps().encode()).hexdigest()[:16]

    @staticmethod
    def from_json(d: dict[str, Any]) -> "CheckPlan":
        if d.get("version", PLAN_VERSION) > PLAN_VERSION:
            raise ValueError(f"unsupported plan version {d['version']}")
        return CheckPlan(rules=[Rule.from_json(r) for r in d["rules"]],
                         mode=d.get("mode", "exhaustive"),
                         version=d.get("version", PLAN_VERSION))

    @staticmethod
    def loads(s: str) -> "CheckPlan":
        return CheckPlan.from_json(json.loads(s))


def default_plan(mode: str = "exhaustive") -> CheckPlan:
    """The built-in CheckPlan for the north-rule interleaved table.

    Covers the FIXTURES.md F1 rule inventory: span-struct conformance
    (kind enum, conditional required fields, media_ref format, offset
    monotonicity/bounds), doc_id uniqueness, and the referential check
    against the media catalog.
    """
    is_media = {"op": "and", "args": [
        {"op": "not_null", "field": "kind"},
        {"op": "ne", "field": "kind", "value": TEXT_KIND},
    ]}
    return CheckPlan(mode=mode, rules=[
        Rule("kind_enum", scope="span",
             check={"op": "is_in", "field": "kind", "values": SPAN_KINDS},
             message="span kind must be one of " + "/".join(SPAN_KINDS)),
        Rule("text_requires_text", scope="span",
             when={"op": "eq", "field": "kind", "value": TEXT_KIND},
             check={"op": "not_null", "field": "text"},
             message="text span must carry a non-null text"),
        Rule("media_requires_ref", scope="span",
             when=is_media,
             check={"op": "not_null", "field": "media_ref"},
             message="media span must carry a non-null media_ref"),
        Rule("media_ref_format", scope="span",
             when={"op": "not_null", "field": "media_ref"},
             check={"op": "format", "field": "media_ref", "format": "media-ref"},
             message="media_ref must match media://<hex16>"),
        Rule("offset_nonnegative", scope="span",
             check={"op": "between", "field": "offset", "min": 0},
             message="span offset must be a non-negative int32"),
        Rule("offset_monotonic", kind="monotonic", scope="span",
             params={"field": "offset", "strict": True},
             message="span offsets must be strictly increasing within a doc"),
        Rule("doc_id_unique", kind="unique", scope="doc",
             params={"key": "doc_id"},
             message="doc_id must be unique across the dataset"),
        Rule("media_ref_exists", kind="ref", scope="span",
             when={"op": "not_null", "field": "media_ref"},
             params={"field": "media_ref", "catalog_key": "media_ref"},
             message="media_ref must exist in the media catalog"),
    ])
