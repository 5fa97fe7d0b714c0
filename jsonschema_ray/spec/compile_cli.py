"""Reference-parity driver for the ``compile`` verb.

Executes ``src/command_compile.cc`` verbatim: positional schema
(JSON/YAML, custom extensions), ``--fast`` / ``--minify`` /
``--include NAME`` / ``--entrypoint`` modes, config + ``--resolve``
resolution, the blaze Template JSON dump (``spec/compile_template.py``)
prettified with the reference renderer, and the typed error surface.
"""

from __future__ import annotations

import json
import os
import re
import sys
from typing import Any

from jsonschema_ray.spec.clierrors import (EXIT_ARGS, EXIT_SCHEMA_INPUT,
                                           CLIArgumentError, CLIError,
                                           InputIsADirectoryError,
                                           NoSuchFileError, NotSchemaError,
                                           emit, validate_http_headers)

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def run(args) -> int:
    json_mode = bool(getattr(args, "as_json", False))
    try:
        return _run(args)
    except CLIError as err:
        return emit(err, json_mode=json_mode)


def _display(entry) -> str:
    return "/dev/stdin" if entry.from_stdin \
        else os.path.realpath(entry.path)


def _run(args) -> int:
    paths = list(getattr(args, "paths", None) or [])
    if not paths:
        err = CLIArgumentError("This command expects a path to a schema")
        err.hint = "For example: jsonschema compile path/to/schema.json"
        raise err
    validate_http_headers(getattr(args, "header", None))

    from jsonschema_ray.state.config import (find_configuration,
                                             load_configuration)
    from jsonschema_ray.state.inputs import (_read_entry,
                                             read_stdin_entry)

    schema_path = paths[0]
    if schema_path == "-":
        entry = read_stdin_entry()
    else:
        rp = os.path.realpath(schema_path)
        if os.path.isdir(rp):
            raise InputIsADirectoryError(rp)
        if not os.path.isfile(rp):
            raise NoSuchFileError(rp)
        entry = _read_entry(schema_path)
    display = _display(entry)

    cfg_base = os.getcwd() if entry.from_stdin \
        else os.path.dirname(os.path.abspath(entry.path))
    cfg_path = find_configuration(cfg_base)
    try:
        cfg = load_configuration(cfg_path) if cfg_path else None
    except json.JSONDecodeError as exc:
        from jsonschema_ray.spec.clierrors import JSONParseError

        raise JSONParseError(exc.lineno, exc.colno,
                             filePath=os.path.realpath(cfg_path)) from exc
    dd = getattr(args, "default_dialect", None)
    if not dd and cfg and isinstance(cfg.get("defaultDialect"), str):
        # a config defaultDialect only applies to files matching the
        # config's extension filter (resolver.h extension gating)
        exts = cfg.get("extension") or []
        applies = True
        if exts and not entry.from_stdin:
            applies = any(str(entry.path).endswith(
                e if str(e).startswith(".") else "." + str(e))
                for e in exts)
        if applies:
            dd = cfg["defaultDialect"]

    schema = entry.parsed()
    if not isinstance(schema, (dict, bool)):
        raise NotSchemaError(display)

    verbose = bool(getattr(args, "verbose", False)
                   or getattr(args, "debug", False))
    debug = bool(getattr(args, "debug", False))
    if debug and cfg_path:
        print(f"debug: Using configuration file: "
              f"{os.path.realpath(cfg_path)}", file=sys.stderr)
    if verbose and (getattr(args, "resolve", None) or []):
        from jsonschema_ray.state.inputs import resolve_extensions

        resolve_extensions(getattr(args, "extension", None), cfg or {},
                           verbose=True, log=sys.stderr)

    # resolution context
    resources: dict[str, Any] = {}
    for r in getattr(args, "resolve", None) or []:
        rpaths = [r]
        if os.path.isdir(r):
            rpaths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(r)
                for n in ns if n.endswith((".json", ".yaml", ".yml")))
        for fp in rpaths:
            arp = os.path.realpath(fp)
            if not os.path.isfile(arp):
                raise NoSuchFileError(arp)
            if debug:
                print(f"debug: Detecting schema resources from file: "
                      f"{arp}", file=sys.stderr)
            doc = _read_entry(fp).parsed()
            if debug:
                print(f"debug: Importing schema into the resolution "
                      f"context: file://{arp}", file=sys.stderr)
            resources[f"file://{arp}"] = doc
            resources[arp] = doc
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    if debug:
                        print(f"debug: Importing schema into the "
                              f"resolution context: {did}",
                              file=sys.stderr)
                    resources.setdefault(did.rstrip("#"), doc)
    remap_aliases = []
    for src_uri, target in ((cfg or {}).get("resolve") or {}).items():
        if "://" in str(target):
            remap_aliases.append((src_uri, str(target)))
            continue
        try:
            resources[src_uri] = _read_entry(str(target)).parsed()
        except Exception:   # noqa: BLE001
            continue
    for src_uri, dst in remap_aliases:
        hit = resources.get(dst) or resources.get(dst.rstrip("#"))
        if hit is not None:
            if debug:
                print(f"debug: Resolving {src_uri} as {dst} given the "
                      f"configuration file", file=sys.stderr)
            resources.setdefault(src_uri, hit)

    if isinstance(schema, dict) and "$schema" not in schema and dd:
        schema = dict(schema)
        schema["$schema"] = dd

    # eager strictness (frame-analysis error family)
    from jsonschema_ray.spec.jschema import compile_schema

    assert_formats = True if getattr(args, "format_assertion", False) \
        else None
    if isinstance(schema, dict):
        from jsonschema_ray.spec.clierrors import (ExternalRefError,
                                                   SchemaReferenceError)
        from jsonschema_ray.spec.lint_cli import _eager_checks

        _eager_checks(entry, resources, dd,
                      "" if entry.from_stdin else "file://" + display)
        # ref-target framing with file-URI absolutized identifiers
        from urllib.parse import urljoin as _uj

        from jsonschema_ray.spec.jschema import (_dialect_ver,
                                                 check_pointer_frames)
        from jsonschema_ray.spec.lintframe import _norm_dialect

        _sd = schema.get("$schema") if isinstance(
            schema.get("$schema"), str) else (dd or "")
        _ver = _dialect_ver({"$schema": _norm_dialect(_sd)}) if _sd             else 2020
        _declared = schema.get("$id") or schema.get("id")
        _base = (_declared if isinstance(_declared, str)
                 else ("" if entry.from_stdin
                       else "file://" + display)).rstrip("#")

        def _check_ref_targets(node, ptr):
            if isinstance(node, list):
                for i, x in enumerate(node):
                    _check_ref_targets(x, f"{ptr}/{i}")
                return
            if not isinstance(node, dict):
                return
            rv = node.get("$ref")
            if isinstance(rv, str) and "#/" in rv:
                dest = _uj(_base or "", rv)
                dbase, _, frag = dest.partition("#")
                if dbase == (_base or "").partition("#")[0]                         and frag.startswith("/"):
                    try:
                        check_pointer_frames(schema, "", frag, _ver,
                                             base_uri=_base,
                                             from_ptr=ptr)
                    except SchemaReferenceError as rerr:
                        raise rerr.with_fields(filePath=display)
                    except Exception:   # noqa: BLE001
                        pass
            for k, v in node.items():
                esc = k.replace("~", "~0").replace("/", "~1")
                _check_ref_targets(v, f"{ptr}/{esc}")

        _check_ref_targets(schema, "")
        try:
            compile_schema(schema, resources={
                k: v for k, v in resources.items()
                if not isinstance(v, str)} or None,
                assert_formats=assert_formats)
        except (SchemaReferenceError, ExternalRefError) as err:
            if "filePath" not in err.fields:
                raise err.with_fields(filePath=display)
            raise
        except CLIError as err:
            if "filePath" not in err.fields:
                raise err.with_fields(filePath=display)
            raise
        except ValueError as exc:
            m = re.search(r"external \$ref not supported \(no network\): "
                          r"'([^']+)'", str(exc))
            if m:
                from jsonschema_ray.spec.clierrors import ExternalRefError

                raise ExternalRefError(m.group(1).partition("#")[0],
                                       filePath=display) from exc
            err = CLIError(str(exc), filePath=display)
            err.exit_code = EXIT_SCHEMA_INPUT
            raise err from exc

    # format assertion via vocabulary
    if assert_formats is None and isinstance(schema, dict):
        meta_uri = schema.get("$schema")
        meta = resources.get(str(meta_uri).rstrip("#")) \
            if isinstance(meta_uri, str) else None
        if meta is None and isinstance(meta_uri, str):
            # embedded metaschemas
            def _find(node):
                if isinstance(node, dict):
                    did = node.get("$id")
                    if isinstance(did, str) \
                            and did.rstrip("#") == meta_uri.rstrip("#"):
                        return node
                    for v in node.values():
                        hit = _find(v)
                        if hit is not None:
                            return hit
                elif isinstance(node, list):
                    for v in node:
                        hit = _find(v)
                        if hit is not None:
                            return hit
                return None
            meta = _find(schema)
        if isinstance(meta, dict):
            vocab = meta.get("$vocabulary")
            if isinstance(vocab, dict) and any(
                    u.rstrip("#").endswith("/format-assertion")
                    for u in vocab):
                assert_formats = True

    default_id = "" if entry.from_stdin else "file://" + display

    entry_ptr = ""
    ep = None
    eps = getattr(args, "entrypoint", None)
    if isinstance(eps, list):
        ep = eps[0] if eps else None
    elif isinstance(eps, str) and eps:
        ep = eps
    if ep:
        entry_ptr = _resolve_entrypoint(schema, ep, display, default_id)

    from jsonschema_ray.spec.compile_template import (TemplateError,
                                                      compile_template)

    try:
        template = compile_template(
            schema, resources=resources, default_dialect=dd,
            default_id=default_id,
            fast=bool(getattr(args, "fast", False)),
            assert_formats=assert_formats, entry_ptr=entry_ptr)
    except TemplateError as exc:
        err = CLIError(str(exc), filePath=display)
        err.exit_code = EXIT_SCHEMA_INPUT
        raise err from exc

    include = getattr(args, "include", None)
    if isinstance(include, list):
        include = include[0] if include else None
    if include:
        if not _IDENT.fullmatch(include):
            err = CLIError("The include identifier is not a valid "
                           "C/C++ identifier", identifier=include)
            err.exit_code = EXIT_ARGS
            raise err
        _emit_header(template, include.upper())
        return 0

    text = json.dumps(template, separators=(",", ":"),
                      ensure_ascii=False)
    if getattr(args, "minify", False):
        sys.stdout.write(text + "\n")
    else:
        from jsonschema_ray.spec.format import prettify_json

        sys.stdout.write(prettify_json(template) + "\n")
    return 0


def _resolve_entrypoint(schema, ep: str, display: str,
                        default_id: str) -> str:
    """Pointer or URI entrypoints (utils.h resolve_entrypoint +
    CompilerInvalidEntryPoint errors)."""
    from jsonschema_ray.spec.lintframe import ptr_str, ptr_tokens, \
        try_get_at

    hint = "Use the `inspect` command to find valid schema locations"

    def not_uri():
        err = CLIError("The given entry point is not a valid URI or "
                       "JSON Pointer", identifier=ep, filePath=display)
        err.exit_code = EXIT_SCHEMA_INPUT
        err.hint = hint
        return err

    def missing(identifier: str):
        err = CLIError("The given entry point URI does not exist in "
                       "the schema", identifier=identifier,
                       filePath=display)
        err.exit_code = EXIT_SCHEMA_INPUT
        err.hint = hint
        return err

    declared = None
    if isinstance(schema, dict):
        declared = schema.get("$id") or schema.get("id")
    own_base = (declared or default_id or "").rstrip("#")
    if ep.startswith("/") or ep == "":
        frag = ep
        identifier = f"{own_base}#{frag}"
    elif "://" in ep or ep.startswith("#"):
        if " " in ep.partition("#")[0]:
            raise not_uri()
        base, _, frag = ep.partition("#")
        if base and base.rstrip("#") not in (
                (default_id or "").rstrip("#"), own_base):
            raise missing(ep)
        identifier = ep
        if not frag:
            return ""
        if not frag.startswith("/"):
            raise missing(ep)
    else:
        raise not_uri()
    # invalid ~-escapes keep the raw spelling in the identifier
    import re as _re

    if _re.search(r"~(?![01])", frag):
        raise missing(f"{own_base}#{frag}"
                      if not ep.startswith(("http", "file")) else ep)
    toks = ptr_tokens(frag)
    node = try_get_at(schema, toks)
    if node is None or not isinstance(node, (dict, bool)):
        raise missing(identifier)
    return frag


def _emit_header(template: list, name: str) -> None:
    data = json.dumps(template, separators=(",", ":"),
                      ensure_ascii=False).encode()
    w = sys.stdout.write
    w(f"#ifndef SOURCEMETA_JSONSCHEMA_INCLUDE_{name}_H_\n")
    w(f"#define SOURCEMETA_JSONSCHEMA_INCLUDE_{name}_H_\n\n")
    w("#ifdef __cplusplus\n#include <cstddef>\n#include <string_view>\n"
      "#endif\n\n")
    w(f"static const char {name}_DATA[] = {{")
    per_line = 12
    for i, b in enumerate(data):
        if i % per_line == 0:
            w("\n  ")
        w(f"0x{b:02x},")
        if (i + 1) % per_line != 0:
            w(" ")
    if len(data) % per_line != 0:
        w("0x00")
    else:
        w("\n  0x00")
    w("\n};\n\n")
    w(f"static const unsigned int {name}_LENGTH = {len(data)};\n\n")
    w("#ifdef __cplusplus\n")
    w(f"static constexpr std::string_view {name}{{{name}_DATA, "
      f"{name}_LENGTH}};\n")
    w("#endif\n\n#endif\n")
