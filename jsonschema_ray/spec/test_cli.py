"""Reference-parity driver for the ``test`` verb.

Executes ``src/command_test.cc`` + the blaze test suite parser/runner
(``vendor/blaze/src/test/test_parser.cc`` / ``test_runner.cc``)
verbatim: schema test documents (string/array ``target``, ``data`` /
``dataPath`` cases, ``rdf`` expectations), per-file PASS/FAIL text
reports with SimpleOutput failure blocks, multi-target headers,
verbose case lines, CTRF ``--json`` documents, the typed
TestParseError surface with file positions, and exit codes (2 on
assertion failure, 6 on empty suites / parse errors).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any
from urllib.parse import urljoin

from jsonschema_ray.spec.clierrors import (EXIT_FAIL, EXIT_OTHER_INPUT,
                                           CLIError, ExternalRefError,
                                           emit, validate_http_headers)
from jsonschema_ray.state.inputs import InputEntry, WalkOptions, walk_inputs

TEST_DOC_HINT = ("Learn more here: https://github.com/sourcemeta/"
                 "jsonschema/blob/main/docs/test.markdown")


class TestParseError(CLIError):
    exit_code = EXIT_OTHER_INPUT
    hint = TEST_DOC_HINT


def _positions_of(entry: InputEntry) -> dict:
    from jsonschema_ray.spec.positions import (pointer_positions,
                                               yaml_pointer_positions)

    try:
        if entry.yaml:
            return yaml_pointer_positions(entry.text)
        return pointer_positions(entry.text)
    except Exception:   # noqa: BLE001 — positions are best-effort
        return {}


def _esc_ptr(tok: str) -> str:
    return str(tok).replace("~", "~0").replace("/", "~1")


class _Suite:
    __slots__ = ("targets", "tests", "display")


def _parse_suite(entry: InputEntry, positions: dict) -> _Suite:
    """TestSuite::parse shape validation (test_parser.cc) with the
    reference's exact wordings and pointer positions."""
    doc = entry.parsed()
    display = os.path.realpath(entry.path) if not entry.from_stdin \
        else entry.path

    def err(message: str, loc: str):
        pos = positions.get(loc)
        fields = {"filePath": display, "location": loc}
        if pos:
            fields = {"line": pos[0], "column": pos[1], **fields}
        e = TestParseError(message)
        e.fields = fields
        return e

    if not isinstance(doc, dict):
        raise err("The test document must be an object", "")
    if "target" not in doc:
        raise err("The test document must contain a `target` property", "")
    target = doc["target"]
    if not isinstance(target, (str, list)):
        raise err("The test document `target` property must be a URI or "
                  "an array of URIs", "/target")
    if "tests" not in doc:
        raise err("The test document must contain a `tests` property", "")
    if not isinstance(doc["tests"], list):
        raise err("The test document `tests` property must be an array",
                  "/tests")

    base_dir = os.path.dirname(os.path.abspath(entry.path)) \
        if not entry.from_stdin else os.getcwd()
    base_uri = "file://" + os.path.join(base_dir, "test.json")

    suite = _Suite()
    suite.display = display
    if isinstance(target, str):
        suite.targets = [urljoin(base_uri, target)]
    else:
        if not target:
            raise err("The test document `target` array must contain at "
                      "least one URI", "/target")
        suite.targets = []
        for i, t in enumerate(target):
            if not isinstance(t, str):
                raise err("Each entry in the test document `target` array "
                          "must be a URI", f"/target/{i}")
            suite.targets.append(urljoin(base_uri, t))

    suite.tests = []
    for i, case in enumerate(doc["tests"]):
        loc = f"/tests/{i}"
        if not isinstance(case, dict):
            raise err("Test case documents must be objects", loc)
        if "data" not in case and "dataPath" not in case:
            raise err("Test case documents must contain a `data` or "
                      "`dataPath` property", loc)
        if "data" in case and "dataPath" in case:
            raise err("Test case documents must contain either a `data` "
                      "or `dataPath` property, but not both", loc)
        if "dataPath" in case and not isinstance(case["dataPath"], str):
            raise err("Test case documents must set the `dataPath` "
                      "property to a string", f"{loc}/dataPath")
        if "description" in case \
                and not isinstance(case["description"], str):
            raise err("If you set a test case description, it must be a "
                      "string", f"{loc}/description")
        if "valid" not in case:
            raise err("Test case documents must contain a `valid` "
                      "property", loc)
        if not isinstance(case["valid"], bool):
            raise err("The test case document `valid` property must be a "
                      "boolean", f"{loc}/valid")
        if "rdf" in case and "rdfPath" in case:
            raise err("Test case documents may contain either an `rdf` "
                      "or `rdfPath` property, but not both", loc)
        if "rdfPath" in case and not isinstance(case["rdfPath"], str):
            raise err("Test case documents must set the `rdfPath` "
                      "property to a string", f"{loc}/rdfPath")
        if ("rdf" in case or "rdfPath" in case) \
                and case["valid"] is not True:
            raise err("Test case documents may only set the `rdf` or "
                      "`rdfPath` property when the `valid` property is "
                      "set to true", loc)
        if "rdf" in case and not isinstance(case["rdf"], list):
            raise err("Test case documents must set the `rdf` property "
                      "to an array", f"{loc}/rdf")
        parsed = {
            "description": case.get("description", ""),
            "valid": case["valid"],
            "index": i,
            "rdf": None,
            "data_spans": {},
        }
        if "rdf" in case:
            parsed["rdf"] = case["rdf"]
        elif "rdfPath" in case:
            rp = os.path.normpath(os.path.join(base_dir, case["rdfPath"]))
            from jsonschema_ray.state.inputs import _read_entry

            rdoc = _read_entry(rp).parsed()
            if not isinstance(rdoc, list):
                raise err("The document referenced by the test case "
                          "`rdfPath` property must be an array",
                          f"{loc}/rdfPath")
            parsed["rdf"] = rdoc
        if "data" in case:
            parsed["data"] = case["data"]
        else:
            dp = os.path.normpath(os.path.join(base_dir,
                                               case["dataPath"]))
            from jsonschema_ray.state.inputs import _read_entry

            dentry = _read_entry(dp)
            parsed["data"] = dentry.parsed()
            parsed["data_spans"] = _positions_of(dentry)
        suite.tests.append(parsed)
    return suite


def _resources_for(entry: InputEntry | None, resolves: list[str],
                   config: dict | None, config_path: str | None,
                   debug: bool = False,
                   extensions: list[str] | None = None,
                   default_dialect: str | None = None) -> dict:
    """--resolve files/dirs + config resolve remaps, keyed by file://
    URI, bare path, and declared identifier. Every imported document
    must have a determinable base dialect (resolver.h strictness)."""
    from jsonschema_ray.spec.clierrors import SchemaUnknownBaseDialectError

    resources: dict[str, Any] = {}
    want = [e if not e or e.startswith(".") else "." + e
            for e in (extensions or [])] or [".json", ".yaml", ".yml"]

    def load_into(p: str):
        paths = [p]
        if os.path.isdir(p):
            paths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(p)
                for n in ns
                if any((not e and "." not in n) or (e and n.endswith(e))
                       for e in want))
        for fp in paths:
            ap = os.path.realpath(fp)
            if debug:
                print(f"debug: Detecting schema resources from file: "
                      f"{ap}", file=sys.stderr)
            from jsonschema_ray.state.inputs import _read_entry

            try:
                doc = _read_entry(fp).parsed()
            except Exception:   # noqa: BLE001
                continue
            if debug:
                print(f"debug: Importing schema into the resolution "
                      f"context: file://{ap}", file=sys.stderr)
            resources[f"file://{ap}"] = doc
            resources[ap] = doc
            if isinstance(doc, dict):
                if "$schema" not in doc and not default_dialect:
                    raise SchemaUnknownBaseDialectError(filePath=ap)
                from jsonschema_ray.spec.lint_cli import _eager_checks
                from jsonschema_ray.state.inputs import \
                    _read_entry as _re2

                _eager_checks(_re2(fp), dict(resources),
                              default_dialect, "file://" + ap)
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    if debug:
                        print(f"debug: Importing schema into the "
                              f"resolution context: {did}",
                              file=sys.stderr)
                    resources.setdefault(did.rstrip("#"), doc)

    for r in resolves or []:
        load_into(os.path.abspath(r))
    aliases = []
    for src_uri, target in ((config or {}).get("resolve") or {}).items():
        if "://" in str(target):
            aliases.append((src_uri, str(target)))
            continue
        tp = target if os.path.isabs(str(target)) else os.path.normpath(
            os.path.join(os.path.dirname(config_path or "."),
                         str(target)))
        from jsonschema_ray.state.inputs import _read_entry

        try:
            resources[src_uri] = _read_entry(tp).parsed()
        except Exception:   # noqa: BLE001
            continue
    for src_uri, dst in aliases:
        hit = resources.get(dst) or resources.get(dst.rstrip("#"))
        if hit is not None:
            resources.setdefault(src_uri, hit)
    return resources



def _under_test_error(target: str, display: str) -> CLIError:
    """TestSuite::parse: an unresolvable target $ref becomes
    "Could not resolve schema under test" (test_parser.cc:239-244)."""
    err = CLIError("Could not resolve schema under test",
                   identifier=target, filePath=display)
    err.exit_code = 4
    err.hint = ("This is likely because you forgot to import such "
                "schema using `--resolve/-r`")
    return err


def _find_anchor(doc: Any, name: str) -> Any | None:
    if isinstance(doc, dict):
        if doc.get("$anchor") == name or doc.get("$dynamicAnchor") == name \
                or doc.get("$id") == f"#{name}" \
                or doc.get("id") == f"#{name}":
            return doc
        for v in doc.values():
            hit = _find_anchor(v, name)
            if hit is not None:
                return hit
    elif isinstance(doc, list):
        for v in doc:
            hit = _find_anchor(v, name)
            if hit is not None:
                return hit
    return None


def _resolve_target(target: str, resources: dict,
                    display: str) -> Any:
    """Resolve a target URI to its schema document: the resolution
    context first, the filesystem for file:// URIs. Unresolvable →
    the external-reference error (command_test.cc via TestSuite
    compile)."""
    base, _, frag = target.partition("#")
    doc = resources.get(target) or resources.get(base) \
        or resources.get(base.rstrip("/"))
    if doc is None and base.startswith("file://"):
        path = base[len("file://"):]
        if os.path.isfile(path):
            from jsonschema_ray.state.inputs import _read_entry

            doc = _read_entry(path).parsed()
    if doc is None:
        raise ExternalRefError(base, filePath=display)
    if frag and not frag.startswith("/"):
        # anchor fragment: find the $anchor/$dynamicAnchor (or legacy
        # "#name" id) subtree
        sub = _find_anchor(doc, frag)
        if sub is None:
            raise _under_test_error(target, display)
        if isinstance(sub, dict) and "$schema" not in sub \
                and isinstance(doc, dict) \
                and isinstance(doc.get("$schema"), str):
            sub = dict(sub)
            sub["$schema"] = doc["$schema"]
        return sub
    if frag:
        from jsonschema_ray.spec.lintframe import ptr_tokens, try_get_at

        sub = try_get_at(doc, ptr_tokens(frag))
        if sub is None:
            raise _under_test_error(target, display)
        if isinstance(sub, dict) and "$schema" not in sub \
                and isinstance(doc, dict) \
                and isinstance(doc.get("$schema"), str):
            sub = dict(sub)
            sub["$schema"] = doc["$schema"]
        return sub
    return doc


class _CompiledTarget:
    __slots__ = ("doc", "checker", "explainer", "dialect")


def _compile_target(target: str, resources: dict, display: str,
                    default_dialect: str | None,
                    assert_formats: bool) -> _CompiledTarget:
    from jsonschema_ray.spec.describe import Explainer
    from jsonschema_ray.spec.jschema import compile_schema

    doc = _resolve_target(target, resources, display)
    if isinstance(doc, dict) and "$schema" not in doc and default_dialect:
        doc = dict(doc)
        doc["$schema"] = default_dialect
    try:
        checker = compile_schema(doc, resources=resources or None,
                                 assert_formats=assert_formats)
    except CLIError as err:
        # the reference compiles the wrapped target with remote
        # resources bundled under /$defs/<uri>: error locations are
        # reported within that bundle view (test_parser.cc wrap +
        # compile)
        loc = err.fields.get("location")
        if isinstance(loc, str):
            base = target.partition("#")[0]
            esc = base.replace("~", "~0").replace("/", "~1")
            err = err.with_fields(location=f"/$defs/{esc}{loc}")
        if "filePath" not in err.fields:
            err = err.with_fields(filePath=display)
        raise err
    except ValueError as err:
        import re as _re

        m = _re.search(r"external \$ref not supported \(no network\): "
                       r"'([^']+)'", str(err))
        if m:
            raise ExternalRefError(m.group(1).partition("#")[0],
                                   filePath=display) from err
        e = CLIError(str(err), filePath=display)
        e.exit_code = 4
        raise e from err
    ct = _CompiledTarget()
    ct.doc = doc
    ct.checker = checker
    ct.explainer = Explainer(resources=resources,
                             assert_formats=assert_formats)
    ct.dialect = default_dialect
    return ct


def _case_outcome(ct: _CompiledTarget, case: dict,
                  schema_for_rdf: Any) -> dict:
    """(valid, rdf_ok, rdf_got, rdf_error) for one case."""
    valid = ct.checker.is_valid(case["data"])
    out = {"valid": valid, "passed": valid == case["valid"],
           "rdf": None, "rdf_error": None}
    if valid and case["valid"] and case.get("rdf") is not None:
        from jsonschema_ray.spec.jsonld import promote

        try:
            got = promote(schema_for_rdf, case["data"])
        except Exception as exc:   # noqa: BLE001 — typed below
            out["passed"] = False
            out["rdf_error"] = exc
            out["schema_doc"] = schema_for_rdf
            return out
        from jsonschema_ray.spec.lintrules import jeq

        if not jeq(got, case["rdf"]):
            out["passed"] = False
            out["rdf"] = got
    return out


def _failure_block(ct: _CompiledTarget, case: dict) -> str:
    from jsonschema_ray.spec.validate_cli import _render_failure

    _ok, errs = ct.explainer.validate(ct.doc, case["data"],
                                      default_dialect=ct.dialect)
    return _render_failure(errs, case.get("data_spans") or {})


def _print_rdf_failure(entry: InputEntry, positions: dict, case: dict,
                       outcome: dict, w) -> None:
    """print_rdf_failure (command_test.cc:27-95)."""
    index = case["index"]
    if outcome["rdf_error"] is not None:
        exc = outcome["rdf_error"]
        iloc = getattr(exc, "instance_location", None) or ""
        base = ""
        if isinstance(outcome.get("schema_doc"), dict):
            did = outcome["schema_doc"].get("$id") \
                or outcome["schema_doc"].get("id")
            if isinstance(did, str):
                base = did.rstrip("#")
        pos = positions.get(f"/tests/{index}/data{iloc}") \
            or positions.get(f"/tests/{index}/dataPath")
        w(f"error: {getattr(exc, 'message', str(exc))}\n")
        if pos:
            w(f"  at line {pos[0]}\n  at column {pos[1]}\n")
        w(f'  at instance location "{iloc}"\n')
        facet = getattr(exc, "facet", None)
        if facet:
            w(f'  at facet "{facet}"\n')
        sloc = getattr(exc, "schema_location", None)
        if sloc is not None:
            w(f"  at schema location {base}#{sloc}\n")
        oloc = getattr(exc, "other_location", None)
        if oloc is not None:
            w(f"  at conflicting schema location {base}#{oloc}\n")
        ioloc = getattr(exc, "inert_override_location", None)
        w(f"  at file path {os.path.realpath(entry.path)}\n")
        if ioloc is not None:
            w("\nThe x-jsonld-override mark was ignored because it does "
              "not enclose the\n"
              "conflicting annotation. Move the conflicting annotation, "
              "or the reference\n"
              "that brings it in, inside the overriding object for the "
              "override to\n"
              "take effect\n")
        return
    loc = f"/tests/{index}/rdf"
    pos = positions.get(loc)
    if pos is None:
        loc = f"/tests/{index}/rdfPath"
        pos = positions.get(loc)
    w("error: RDF expansion mismatch\n")
    if pos:
        w(f"  at line {pos[0]}\n  at column {pos[1]}\n")
    w(f"  at file path {os.path.realpath(entry.path)}\n")
    w(f'  at location "{loc}"\n\n')
    from jsonschema_ray.spec.format import prettify_json

    w(prettify_json(outcome["rdf"]) + "\n")


def run(args) -> int:
    json_mode = bool(getattr(args, "as_json", False))
    try:
        validate_http_headers(getattr(args, "header", None))
        if json_mode:
            return _run_ctrf(args)
        return _run_text(args)
    except CLIError as err:
        return emit(err, json_mode=json_mode)


def _entries(args) -> list[InputEntry]:
    return walk_inputs(
        list(getattr(args, "paths", None) or []),
        WalkOptions(extensions=getattr(args, "extension", None),
                    ignores=getattr(args, "ignore", None),
                    verbose=bool(getattr(args, "verbose", False)),
                    debug=bool(getattr(args, "debug", False))))


def _prep_entry(args, entry: InputEntry):
    from jsonschema_ray.state.config import (find_configuration,
                                             load_configuration)

    cfg_path = None if entry.from_stdin else find_configuration(
        os.path.dirname(os.path.abspath(entry.path)))
    cfg = load_configuration(cfg_path) if cfg_path else None
    dd = getattr(args, "default_dialect", None) or (
        cfg.get("defaultDialect")
        if cfg and isinstance(cfg.get("defaultDialect"), str) else None)
    resources = _resources_for(
        entry, getattr(args, "resolve", None) or [], cfg, cfg_path,
        debug=bool(getattr(args, "debug", False)),
        extensions=getattr(args, "extension", None),
        default_dialect=dd)
    return dd, resources


def _run_text(args) -> int:
    verbose = bool(getattr(args, "verbose", False)
                   or getattr(args, "debug", False))
    result = True
    empty_suite = False
    w = sys.stdout.write
    assert_formats = True \
        if getattr(args, "format_assertion", False) else None

    for entry in _entries(args):
        dd, resources = _prep_entry(args, entry)
        positions = _positions_of(entry)
        display = os.path.realpath(entry.path) if not entry.from_stdin \
            else entry.path
        try:
            suite = _parse_suite(entry, positions)
            targets = [
                _compile_target(t, resources, display, dd, assert_formats)
                for t in suite.targets]
        except CLIError:
            w(f"{display}:\n")
            sys.stdout.flush()
            raise
        w(f"{display}:")
        multi = len(suite.targets) > 1
        last_header: str | None = None
        total = len(suite.tests) * len(targets)
        passed = 0
        index = 0
        for t_i, ct in enumerate(targets):
            for case in suite.tests:
                index += 1
                outcome = _case_outcome(ct, case, ct.doc)
                if verbose and index == 1:
                    w("\n")
                indent = "    " if multi else "  "
                desc = case["description"] or "<no description>"
                target_uri = suite.targets[t_i]

                def header():
                    nonlocal last_header
                    if multi and last_header != target_uri:
                        w(f"  {target_uri}:\n")
                        last_header = target_uri

                if outcome["passed"]:
                    passed += 1
                    if verbose:
                        header()
                        w(f"{indent}{index}/{total} PASS {desc}\n")
                elif not case["valid"] and outcome["valid"]:
                    if not verbose:
                        w("\n")
                    header()
                    w(f"{indent}{index}/{total} FAIL {desc}\n\n"
                      "error: Passed but was expected to fail\n")
                    if index != total and verbose:
                        w("\n")
                elif not outcome["valid"]:
                    if not verbose:
                        w("\n")
                    header()
                    w(f"{indent}{index}/{total} FAIL {desc}\n\n")
                    w(_failure_block(ct, case))
                    if index != total and verbose:
                        w("\n")
                else:
                    if not verbose:
                        w("\n")
                    header()
                    w(f"{indent}{index}/{total} FAIL {desc}\n\n")
                    _print_rdf_failure(entry, positions, case, outcome, w)
                    if index != total and verbose:
                        w("\n")
        if passed != total:
            result = False
        if total == 0:
            empty_suite = True
            w(" NO TESTS\n")
        elif not verbose and passed == total:
            w(f" PASS {passed}/{total}\n")
    if not result:
        return EXIT_FAIL
    if empty_suite:
        return EXIT_OTHER_INPUT
    return 0


def _run_ctrf(args) -> int:
    from jsonschema_ray import __version__

    result = True
    empty_suite = False
    ctrf_tests: list[dict] = []
    total_passed = total_failed = 0
    assert_formats = True \
        if getattr(args, "format_assertion", False) else None

    start_ms = int(time.time() * 1000)
    for entry in _entries(args):
        dd, resources = _prep_entry(args, entry)
        positions = _positions_of(entry)
        display = os.path.realpath(entry.path) if not entry.from_stdin \
            else entry.path
        suite = _parse_suite(entry, positions)
        targets = [
            _compile_target(t, resources, display, dd, assert_formats)
            for t in suite.targets]
        total = len(suite.tests) * len(targets)
        passed = 0
        for t_i, ct in enumerate(targets):
            for case in suite.tests:
                outcome = _case_outcome(ct, case, ct.doc)
                desc = case["description"] or "<no description>"
                pos = positions.get(f"/tests/{case['index']}") or (1, 1)
                obj = {
                    "name": desc,
                    "status": "passed" if outcome["passed"] else "failed",
                    "duration": 0,
                    "suite": [suite.targets[t_i]],
                    "type": "unit",
                    "filePath": display,
                    "line": pos[0],
                    "retries": 0,
                    "flaky": False,
                    "threadId": "0",
                }
                if outcome["passed"]:
                    passed += 1
                elif not case["valid"] and outcome["valid"]:
                    obj["message"] = "Passed but was expected to fail"
                elif not outcome["valid"]:
                    obj["trace"] = _failure_block(ct, case)
                else:
                    buf: list[str] = []
                    _print_rdf_failure(entry, positions, case, outcome,
                                       buf.append)
                    obj["trace"] = "".join(buf)
                ctrf_tests.append(obj)
        total_passed += passed
        total_failed += total - passed
        if total == 0:
            empty_suite = True
        if passed != total:
            result = False
    stop_ms = int(time.time() * 1000)

    doc = {
        "reportFormat": "CTRF",
        "specVersion": "0.0.0",
        "results": {
            "tool": {"name": "jsonschema", "version": __version__},
            "summary": {
                "tests": total_passed + total_failed,
                "passed": total_passed,
                "failed": total_failed,
                "pending": 0,
                "skipped": 0,
                "other": 0,
                "start": start_ms,
                "stop": stop_ms,
            },
            "tests": ctrf_tests,
        },
    }
    from jsonschema_ray.spec.format import prettify_json

    sys.stdout.write(prettify_json(doc) + "\n")
    if not result:
        return EXIT_FAIL
    if empty_suite:
        return EXIT_OTHER_INPUT
    return 0
