"""Reference-parity driver for the ``rdf`` verb.

Executes ``src/command_rdf.cc`` verbatim: exactly two positionals
(schema + instance, ``-`` for stdin), x-jsonld promotion to expanded
JSON-LD with ``--flatten`` / ``--compact CONTEXT`` post-processing,
validation-failure reports (``fail:`` + SimpleOutput block with
instance positions; Standard ``--json`` documents), the enriched
JSON-LD resolution-error surface (facet, absolute schema locations,
inert-override hint), 2019-09+ dialect gating, and the typed
input-error family.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any

from jsonschema_ray.spec.clierrors import (EXIT_FAIL, EXIT_NOT_SUPPORTED,
                                           EXIT_OTHER_INPUT,
                                           EXIT_SCHEMA_INPUT, CLIError,
                                           CLIArgumentError,
                                           InputIsADirectoryError,
                                           NoSuchFileError, NotSchemaError,
                                           emit, validate_http_headers)

_OVERRIDE_HINT = (
    "The x-jsonld-override mark was ignored because it does not "
    "enclose the\n"
    "conflicting annotation. Move the conflicting annotation, or the "
    "reference\n"
    "that brings it in, inside the overriding object for the override "
    "to\n"
    "take effect")

_DIALECT_HINT = (
    "The x-jsonld-* keywords rely on annotation collection, which JSON "
    "Schema\n"
    "only introduced in the 2019-09 dialect. Consider running the "
    "`upgrade`\n"
    "command to move your schema to a newer dialect")


def _read_input(path: str):
    from jsonschema_ray.state.inputs import (_read_entry,
                                             read_stdin_entry)

    if path == "-":
        return read_stdin_entry()
    rp = os.path.realpath(path)
    if os.path.isdir(rp):
        raise InputIsADirectoryError(rp)
    if not os.path.isfile(rp):
        raise NoSuchFileError(rp)
    return _read_entry(path)


def _display(entry) -> str:
    return "/dev/stdin" if entry.from_stdin \
        else os.path.realpath(entry.path)



def _parsed(entry) -> Any:
    """entry.parsed() with YAML syntax errors translated to the
    reference's libyaml wordings (exit 6 with mark positions)."""
    try:
        return entry.parsed()
    except CLIError:
        raise
    except Exception as exc:   # noqa: BLE001 — yaml parse errors
        problem = getattr(exc, "problem", None)
        mark = getattr(exc, "problem_mark", None)
        if problem is None or mark is None:
            raise
        message = str(problem)
        if "expected ',' or ']'" in message:
            message = "Missing comma in flow sequence"
        elif "expected ',' or '}'" in message:
            message = "Missing comma in flow mapping"
        line = mark.line + 1
        if mark.index >= len(entry.text):
            line += 1   # libyaml reports EOF errors one line past
        err = CLIError(message, line=line, column=mark.column,
                       filePath=_display(entry))
        err.exit_code = EXIT_OTHER_INPUT
        raise err from exc


def run(args) -> int:
    json_mode = bool(getattr(args, "as_json", False))
    try:
        return _run(args, json_mode)
    except CLIError as err:
        return emit(err, json_mode=json_mode)


def _run(args, json_mode: bool) -> int:
    paths = list(getattr(args, "paths", None) or [])
    if len(paths) != 2:
        err = CLIArgumentError(
            "This command expects a path to a schema and a path to an "
            "instance to promote to JSON-LD")
        err.hint = ("For example: jsonschema rdf path/to/schema.json "
                    "path/to/instance.json")
        raise err
    validate_http_headers(getattr(args, "header", None))
    if paths.count("-") > 1:
        raise CLIArgumentError(
            "Cannot read from standard input more than once")

    from jsonschema_ray.state.config import (find_configuration,
                                             load_configuration)

    schema_entry = _read_input(paths[0])
    cfg_base = os.getcwd() if schema_entry.from_stdin \
        else os.path.dirname(os.path.abspath(schema_entry.path))
    cfg_path = find_configuration(cfg_base)
    try:
        cfg = load_configuration(cfg_path) if cfg_path else None
    except json.JSONDecodeError as exc:
        from jsonschema_ray.spec.clierrors import JSONParseError

        raise JSONParseError(exc.lineno, exc.colno,
                             filePath=os.path.realpath(cfg_path)) \
            from exc
    dd = getattr(args, "default_dialect", None) or (
        cfg.get("defaultDialect")
        if cfg and isinstance(cfg.get("defaultDialect"), str) else None)

    schema = _parsed(schema_entry)
    if not isinstance(schema, (dict, bool)):
        raise NotSchemaError(_display(schema_entry))

    resources: dict[str, Any] = {}
    for r in getattr(args, "resolve", None) or []:
        rpaths = [r]
        if os.path.isdir(r):
            rpaths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(r)
                for n in ns if n.endswith((".json", ".yaml", ".yml")))
        for fp in rpaths:
            try:
                doc = _read_input(fp).parsed()
            except CLIError:
                raise
            ap = os.path.realpath(fp)
            resources[f"file://{ap}"] = doc
            resources[ap] = doc
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    resources.setdefault(did.rstrip("#"), doc)
    for src_uri, target in ((cfg or {}).get("resolve") or {}).items():
        if "://" in str(target):
            hit = resources.get(str(target)) \
                or resources.get(str(target).rstrip("#"))
            if hit is not None:
                resources.setdefault(src_uri, hit)
            continue
        try:
            resources[src_uri] = _read_input(str(target)).parsed()
        except CLIError:
            continue

    if isinstance(schema, dict) and "$schema" not in schema and dd:
        schema = dict(schema)
        schema["$schema"] = dd

    # annotation support requires a 2019-09+ base dialect
    schema_display = _display(schema_entry)
    if isinstance(schema, dict) and "$schema" not in schema:
        from jsonschema_ray.spec.clierrors import \
            SchemaUnknownBaseDialectError

        raise SchemaUnknownBaseDialectError(filePath=schema_display)
    dialect = schema.get("$schema") if isinstance(schema, dict) else dd
    if not isinstance(dialect, str):
        from jsonschema_ray.spec.clierrors import \
            SchemaUnknownBaseDialectError

        raise SchemaUnknownBaseDialectError(filePath=schema_display)
    from jsonschema_ray.spec.lintframe import base_dialect_name

    def _meta_resolver(uri):
        return resources.get(uri) or resources.get(uri.rstrip("#"))

    bd = base_dialect_name(dialect, _meta_resolver)
    if bd is None:
        from jsonschema_ray.spec.clierrors import SchemaResolutionError

        raise SchemaResolutionError(dialect, filePath=schema_display)
    if bd not in ("JSON_Schema_2020_12", "JSON_Schema_2020_12_Hyper",
                  "JSON_Schema_2019_09", "JSON_Schema_2019_09_Hyper"):
        err = CLIError("This command requires the schema to declare "
                       "JSON Schema 2019-09 or newer",
                       identifier=str(dialect),
                       filePath=schema_display)
        err.exit_code = EXIT_SCHEMA_INPUT
        err.hint = _DIALECT_HINT
        raise err

    from jsonschema_ray.spec.jschema import compile_schema
    from jsonschema_ray.spec.validate_cli import _resolve_external_refs

    _resolve_external_refs(
        schema,
        "" if schema_entry.from_stdin else "file://" + schema_display,
        resources, schema_display)
    # compile_schema resolves raw relative refs verbatim: register the
    # sibling files under their literal ref spellings too
    if not schema_entry.from_stdin:
        schema_dir = os.path.dirname(os.path.abspath(schema_entry.path))

        def _alias_refs(node):
            if isinstance(node, dict):
                ref = node.get("$ref")
                if isinstance(ref, str) and not ref.startswith("#") \
                        and "://" not in ref:
                    rel = ref.partition("#")[0]
                    fpath = os.path.normpath(
                        os.path.join(schema_dir, rel))
                    if os.path.isfile(fpath) and ref not in resources:
                        try:
                            sub = _read_input(fpath).parsed()
                        except CLIError:
                            sub = None
                        if sub is not None:
                            resources[rel] = sub
                            resources["./" + rel.lstrip("./")] = sub
                for v in node.values():
                    _alias_refs(v)
            elif isinstance(node, list):
                for v in node:
                    _alias_refs(v)

        _alias_refs(schema)

    assert_formats = True if getattr(args, "format_assertion", False) \
        else None
    try:
        checker = compile_schema(schema, resources=resources or None,
                                 assert_formats=assert_formats)
    except CLIError as err:
        if "filePath" not in err.fields:
            raise err.with_fields(filePath=schema_display)
        raise
    except ValueError as exc:
        import re as _re

        m = _re.search(r"external \$ref not supported \(no network\): "
                       r"'([^']+)'", str(exc))
        if m:
            from jsonschema_ray.spec.clierrors import ExternalRefError \
                as _ERE

            raise _ERE(m.group(1).partition("#")[0],
                       filePath=schema_display) from exc
        err = CLIError(str(exc), filePath=schema_display)
        err.exit_code = EXIT_SCHEMA_INPUT
        raise err from exc

    instance_entry = _read_input(paths[1])
    instance = _parsed(instance_entry)
    instance_display = _display(instance_entry)

    if not checker.is_valid(instance):
        from jsonschema_ray.spec.describe import Explainer
        from jsonschema_ray.spec.positions import pointer_positions

        ex = Explainer(resources=resources,
                       assert_formats=assert_formats)
        if json_mode:
            from jsonschema_ray.spec.format import prettify_json
            from jsonschema_ray.spec.validate_cli import _std_error

            spans = {}
            try:
                spans = pointer_positions(instance_entry.text)
            except Exception:   # noqa: BLE001
                pass
            fast = bool(getattr(args, "fast", False))
            buri = "" if schema_entry.from_stdin \
                else "file://" + schema_display
            ok, errs = ex.validate(schema, instance, base_uri=buri,
                                   fast=fast)
            if fast:
                doc = {"valid": False}
            else:
                doc = {"valid": False,
                       "errors": [_std_error(e, spans) for e in errs]}
            sys.stdout.write(prettify_json(doc) + "\n")
        else:
            from jsonschema_ray.spec.validate_cli import _render_failure

            spans = {}
            try:
                spans = pointer_positions(instance_entry.text)
            except Exception:   # noqa: BLE001
                pass
            _ok, errs = ex.validate(schema, instance)
            if getattr(args, "fast", False):
                errs = errs[:1]
            sys.stderr.write(f"fail: {instance_display}\n")
            sys.stderr.write(_render_failure(errs, spans))
        return EXIT_FAIL

    from jsonschema_ray.spec.jsonld import ResolutionError, promote

    base = ""
    if isinstance(schema, dict):
        did = schema.get("$id") or schema.get("id")
        if isinstance(did, str):
            base = did.rstrip("#")
    if not base:
        base = "file://" + schema_display if not schema_entry.from_stdin \
            else ""

    try:
        document = promote(schema, instance,
                           resources=resources or None,
                           assert_formats=assert_formats,
                           validate=False)
    except ResolutionError as exc:
        iloc = getattr(exc, "instance_location", None) or ""
        fields: dict[str, Any] = {}
        try:
            from jsonschema_ray.spec.positions import pointer_positions

            pos = pointer_positions(instance_entry.text).get(iloc)
            if pos:
                fields["line"], fields["column"] = pos[0], pos[1]
        except Exception:   # noqa: BLE001
            pass
        fields["instanceLocation"] = iloc
        facet = getattr(exc, "facet", None)
        if facet:
            fields["facet"] = facet
        sloc = getattr(exc, "schema_location", None)
        if sloc is not None:
            fields["schemaLocation"] = f"{base}#{sloc}"
        oloc = getattr(exc, "other_location", None)
        if oloc is not None:
            fields["conflictingSchemaLocation"] = f"{base}#{oloc}"
        ioloc = getattr(exc, "inert_override_location", None)
        if ioloc is not None:
            fields["inertOverrideLocation"] = f"{base}#{ioloc}"
        fields["filePath"] = instance_display
        err = CLIError(getattr(exc, "message", str(exc)))
        err.fields = fields
        err.exit_code = EXIT_SCHEMA_INPUT
        if ioloc is not None:
            err.hint = _OVERRIDE_HINT
        raise err from exc

    from jsonschema_ray.spec.format import prettify_json

    if getattr(args, "compact", None):
        ctx_entry = _read_input(args.compact)
        ctx_doc = ctx_entry.parsed()
        from jsonschema_ray.spec.jsonld import compact as _compact
        from jsonschema_ray.spec.jsonld import flatten as _flatten

        def _jsonld_err(exc, path):
            err = CLIError(getattr(exc, "message", str(exc)),
                           filePath=path)
            sloc = getattr(exc, "schema_location", None)
            if sloc is not None:
                err.fields["location"] = sloc
            err.labels = {"location": "document location"}
            err.exit_code = EXIT_OTHER_INPUT
            return err

        try:
            _probe = _compact([], ctx_doc)
        except ValueError as exc:
            raise _jsonld_err(exc, _display(ctx_entry)) from exc
        try:
            if getattr(args, "flatten", False):
                document = _flatten(document)
                document = _compact(document, ctx_doc)
            else:
                document = _compact(document, ctx_doc)
        except ValueError as exc:
            raise _jsonld_err(exc, instance_display) from exc
    elif getattr(args, "flatten", False):
        from jsonschema_ray.spec.jsonld import flatten as _flatten

        document = _flatten(document)

    if getattr(args, "verbose", False) or getattr(args, "debug", False):
        print(f"ok: {instance_display}\n  matches {schema_display}",
              file=sys.stderr)
    sys.stdout.write(prettify_json(document) + "\n")
    return 0
