"""Schema test documents — the reference ``test`` verb's input format.

A test document is ``{target: <uri-or-relative-path>, tests: [{
description?, valid: bool, data | dataPath, rdf? }]}``
(``/root/reference/src/command_test.cc:83-300``; detection mirrors
``src/utils.h:105-110``). The target schema is compiled ONCE and reused
across the suite's cases — the per-case work is a verdict comparison,
plus an expanded-JSON-LD equality check when the case carries ``rdf``
expectations (``fail_rdf_mismatch.sh``).

Exit-code contract replicated by callers: 0 all pass, 2 any failing
case, schema errors reject at compile, malformed test documents raise
TestDocumentError (reference exit 6).
"""

from __future__ import annotations

from typing import Any, Callable


class TestDocumentError(ValueError):
    """Malformed test document (reference EXIT_OTHER_INPUT_ERROR=6)."""


def check_test_document(doc: Any) -> None:
    if not isinstance(doc, dict):
        raise TestDocumentError("the test document must be an object")
    if "tests" not in doc:
        raise TestDocumentError(
            "the test document must contain a `tests` property")
    if not isinstance(doc["tests"], list):
        raise TestDocumentError(
            "the test document `tests` property must be an array")
    if not doc["tests"]:
        raise TestDocumentError(
            "the test document must contain at least one test")
    tgt = doc.get("target")
    if not (isinstance(tgt, str)
            or (isinstance(tgt, list) and tgt
                and all(isinstance(t, str) for t in tgt))):
        raise TestDocumentError(
            "the test document must contain a string (or string-array) "
            "`target` property")
    for i, case in enumerate(doc["tests"]):
        if not isinstance(case, dict):
            raise TestDocumentError(f"test #{i + 1} must be an object")
        if not isinstance(case.get("valid"), bool):
            raise TestDocumentError(
                f"test #{i + 1} must contain a boolean `valid` property")
        if "data" not in case and "dataPath" not in case:
            raise TestDocumentError(
                f"test #{i + 1} must contain a `data` or `dataPath` "
                f"property")


def run_test_document(
        doc: dict, *,
        compile_target: Callable[[str], Any],
        load_data_path: Callable[[str], Any] | None = None,
        schema_for_rdf: Any = None) -> dict:
    """Run every case; returns {passed, total, failures: [(index,
    description, reason)]}. ``compile_target(target)`` must return a
    compiled schema exposing ``is_valid``; ``load_data_path`` loads a
    ``dataPath`` instance file; ``schema_for_rdf`` is the raw target
    schema document for x-jsonld expansion when cases carry ``rdf``."""
    check_test_document(doc)
    targets = doc["target"] if isinstance(doc["target"], list) \
        else [doc["target"]]
    passed, failures, total = 0, [], 0
    for target in targets:      # multi-target suites run every case
        cs = compile_target(target)     # per target (PASS 4/4 style)
        for i, case in enumerate(doc["tests"]):
            total += 1
            if "data" in case:
                data = case["data"]
            else:
                if load_data_path is None:
                    raise TestDocumentError(
                        "dataPath is not supported here")
                data = load_data_path(case["dataPath"])
            ok = cs.is_valid(data) == case["valid"]
            reason = "unexpected verdict" if not ok else None
            if ok and "rdf" in case:
                from jsonschema_ray.spec.jsonld import promote

                try:
                    got = promote(schema_for_rdf, data)
                except Exception as e:  # noqa: BLE001 — expansion = FAIL
                    got, reason = None, f"rdf expansion error: {e}"
                    ok = False
                if ok:
                    want = case["rdf"]
                    norm = got if isinstance(got, list) else [got]
                    if norm != want:
                        ok, reason = False, "rdf expansion mismatch"
            if ok:
                passed += 1
            else:
                failures.append((i + 1, case.get("description", ""),
                                 reason))
    return {"passed": passed, "total": total, "failures": failures}
