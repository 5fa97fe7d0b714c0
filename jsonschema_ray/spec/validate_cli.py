"""The reference ``validate`` verb, single-document mode.

Reproduces ``/root/reference/src/command_validate.cc`` end to end:
``validate SCHEMA [INSTANCE...]`` over files, directories, JSONL
(+gzip), YAML and stdin, with the exact output contract — SimpleOutput
failure blocks (via the explaining evaluator in spec/describe.py),
verbose ``ok:`` lines with annotation dumps, Standard Flag/Basic
``--json`` documents, ``--fast`` header-only failures, ``--benchmark``
timing lines, ``--trace`` instruction streams, ``--continue`` JSONL
semantics, entrypoint/template flag conflicts, and the reference exit
code families.

This is the driver-side, one-document-at-a-time front door. Bulk
datasets flow through the vectorized CheckPlan engine
(pipelines/validate.py) instead; both compile from the same schemas.
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import sys
import time
from typing import Any

from jsonschema_ray.spec.clierrors import (CLIArgumentError, CLIError,
                                           InputIsADirectoryError,
                                           JSONParseError, NoSuchFileError,
                                           NotSchemaError,
                                           SchemaRelativeMetaschemaError,
                                           SchemaUnknownBaseDialectError,
                                           emit, validate_http_headers)
from jsonschema_ray.spec.describe import Explainer, ExplainError


def _conflict(msg: str) -> CLIArgumentError:
    return CLIArgumentError(msg)


def _spans_for(text: str, is_yaml: bool) -> dict:
    from jsonschema_ray.spec.positions import (pointer_positions,
                                               yaml_pointer_positions)

    try:
        return yaml_pointer_positions(text) if is_yaml \
            else pointer_positions(text)
    except Exception:   # noqa: BLE001 — positions are best-effort
        return {}


def _render_failure(errs, spans) -> str:
    out = "error: Schema validation failure\n"
    for e in errs:
        out += f"  {e.message}\n"
        out += f'    at instance location "{e.instance_location}"'
        span = spans.get(e.instance_location)
        if span:
            out += f" (line {span[0]}, column {span[1]})"
        out += "\n"
        out += f'    at evaluate path "{e.evaluate_path}"\n'
    return out


def _std_error(e, spans) -> dict:
    obj = {"keywordLocation": e.evaluate_path,
           "absoluteKeywordLocation": e.schema_location,
           "instanceLocation": e.instance_location}
    span = spans.get(e.instance_location)
    if span:
        obj["instancePosition"] = list(span)
    obj["error"] = e.message
    return obj


def _std_annotation(a: dict, spans) -> dict:
    obj = {"keywordLocation": a["keywordLocation"],
           "absoluteKeywordLocation": a["absoluteKeywordLocation"],
           "instanceLocation": a["instanceLocation"]}
    span = spans.get(a["instanceLocation"])
    if span:
        obj["instancePosition"] = list(span)
    obj["annotation"] = a["annotation"]
    return obj


class _Doc:
    """One instance document: path label, parsed value, source spans,
    multidocument entry index (JSONL)."""

    def __init__(self, label: str, value: Any, spans: dict,
                 index: int = -1, multidocument: bool = False,
                 walked: bool = False):
        self.label = label
        self.value = value
        self.spans = spans
        self.index = index
        self.multidocument = multidocument
        self.walked = walked


def _iter_jsonl(path: str, label: str):
    opener = _gzip.open if path.endswith(".gz") else open
    try:
        with opener(path, "rt", encoding="utf-8") as f:
            text = f.read()
    except (OSError, _gzip.BadGzipFile) as exc:
        if isinstance(exc, FileNotFoundError):
            raise NoSuchFileError(os.path.realpath(path)) from exc
        err = CLIError("Invalid gzip magic bytes",
                       filePath=os.path.realpath(path))
        from jsonschema_ray.spec.clierrors import EXIT_OTHER_INPUT

        err.exit_code = EXIT_OTHER_INPUT
        raise err from exc
    index = 0
    offset_line = 0
    for ln_no, line in enumerate(text.split("\n"), start=1):
        if not line.strip():
            offset_line += 1
            continue
        try:
            value = json.loads(line)
        except json.JSONDecodeError as exc:
            raise JSONParseError(ln_no, exc.colno,
                                 filePath=label) from exc
        # the reference tracks no positions for JSONL entries
        # (fail_jsonl_one.sh: bare instance locations)
        yield _Doc(label, value, {}, index=index, multidocument=True,
                   walked=True)
        index += 1


def run_reference_validate(args) -> int:
    json_mode = getattr(args, "as_json", False)
    try:
        return _run(args, json_mode)
    except CLIError as err:
        return emit(err, json_mode=json_mode)


def _run(args, json_mode: bool) -> int:
    from jsonschema_ray.state.inputs import (WalkOptions, _read_entry,
                                             read_stdin_entry,
                                             walk_inputs)

    validate_http_headers(getattr(args, "header", None))
    schema_arg = args.schema_arg
    instances = list(args.instances or [])
    if [schema_arg, *instances].count("-") > 1:
        raise _conflict("Cannot read from standard input more than once")

    fast = getattr(args, "fast", False)
    bench = getattr(args, "benchmark", False)
    trace = getattr(args, "trace", False)
    cont = getattr(args, "continue_", False)
    loop = getattr(args, "loop", None)
    if bench:
        if loop is None:
            loop = 1
        if str(loop) == "0":
            raise _conflict("The loop number cannot be zero")
        loop = int(loop)
    if getattr(args, "entrypoint", None) and getattr(args, "template",
                                                     None):
        raise _conflict("The --entrypoint option cannot be used with "
                        "--template")
    if getattr(args, "format_assertion", False) and getattr(
            args, "template", None):
        raise _conflict("The --format-assertion option cannot be used "
                        "with --template. Re-compile the template with "
                        "--format-assertion instead")
    if trace and bench:
        raise _conflict("The `--trace/-t` and `--benchmark/-b` options "
                        "are mutually exclusive")

    def single_only(flag: str):
        raise _conflict(f"The `{flag}` option is only allowed given a "
                        f"single instance")

    for flag, on in (("--trace/-t", trace), ("--benchmark/-b", bench)):
        if not on:
            continue
        if len(instances) > 1 or not instances:
            single_only(flag)
        p = instances[0]
        # the reference allows `--benchmark` over one JSONL stream
        # (per-entry timing lines) but rejects directories for both
        # and JSONL for `--trace` (command_validate.cc:384-401)
        if p != "-" and os.path.isdir(p):
            single_only(flag)
        if flag.startswith("--trace") and (p.endswith(".jsonl")
                                           or p.endswith(".jsonl.gz")):
            single_only(flag)

    # ---- schema ------------------------------------------------------
    from jsonschema_ray.state.config import (apply_to_schema, discover,
                                             find_configuration)

    if schema_arg == "-":
        sentry = read_stdin_entry()
        schema_display = "/dev/stdin"
        schema_base_dir = os.getcwd()
        schema_default_id = "file:///dev/stdin"
    else:
        spath = os.path.abspath(schema_arg)
        if not os.path.exists(spath):
            raise NoSuchFileError(os.path.realpath(spath))
        if os.path.isdir(spath):
            raise InputIsADirectoryError(os.path.realpath(spath))
        sentry = _read_entry(os.path.realpath(spath))
        schema_display = sentry.path
        schema_base_dir = os.path.dirname(spath)
        schema_default_id = f"file://{sentry.path}"
    schema = sentry.parsed()
    if not isinstance(schema, (dict, bool)):
        raise NotSchemaError(schema_display)

    tmpl_path = getattr(args, "template", None)
    if tmpl_path:
        # a pre-compiled template replaces compilation when readable;
        # anything else falls back with the reference's warning
        if getattr(args, "verbose", False) or getattr(args, "debug",
                                                      False):
            print(f"Parsing pre-compiled schema template: "
                  f"{os.path.realpath(tmpl_path)}", file=sys.stderr)
        tmpl = None
        try:
            with open(tmpl_path, encoding="utf-8") as f:
                tmpl = json.load(f)
        except Exception:   # noqa: BLE001 — unreadable template
            tmpl = None
        if isinstance(tmpl, dict) \
                and tmpl.get("$comment") == "jsonschema-ray template" \
                and "schema" in tmpl:
            schema = tmpl["schema"]
        elif isinstance(tmpl, list) and tmpl \
                and tmpl[0] == 5 and len(tmpl) == 5:
            # a blaze Template JSON dump (compile verb output): the
            # schema itself still drives error reporting, per the
            # reference's contract
            pass
        else:
            print("warning: Failed to parse pre-compiled schema "
                  "template. Compiling from scratch", file=sys.stderr)

    cfg = discover(schema_base_dir)
    if getattr(args, "debug", False) and cfg is not None:
        cfgp = find_configuration(schema_base_dir)
        print(f"debug: Using configuration file: "
              f"{os.path.realpath(cfgp)}", file=sys.stderr)
    dd = getattr(args, "default_dialect", None)
    if dd is not None and (any(c.isspace() for c in dd)
                           or dd.startswith(":")):
        err = CLIArgumentError("The default dialect is not a valid URI "
                               "reference")
        err.fields = {"value": dd}
        raise err
    if not dd and cfg:
        dd = apply_to_schema(
            {}, cfg, schema_display if schema_arg != "-" else None
            ).get("$schema")
        if dd is not None and (any(c.isspace() for c in dd)
                               or dd.startswith(":")):
            from jsonschema_ray.spec.clierrors import EXIT_OTHER_INPUT

            cfgp = find_configuration(schema_base_dir)
            err = CLIError("The default dialect is not a valid URI "
                           "reference")
            err.fields = {"value": dd,
                          "filePath": os.path.realpath(cfgp)
                          if cfgp else None}
            err.fields = {k: v for k, v in err.fields.items()
                          if v is not None}
            err.exit_code = EXIT_OTHER_INPUT
            raise err
    dd_meta = None
    if dd and "://" not in dd:
        from jsonschema_ray.cli import _resolve_dialect_file

        dd, _dd_ver, dd_meta = _resolve_dialect_file(
            dd, (cfg or {}).get("_dir") or os.getcwd(), cfg)
        if "://" not in dd:
            from jsonschema_ray.spec.clierrors import SchemaKeywordError

            err = SchemaKeywordError("The dialect is not a valid URI",
                                     value=dd, keyword="--default-dialect")
            err.fields = {"value": dd}
            raise err
    ds = schema.get("$schema") if isinstance(schema, dict) else None
    if isinstance(ds, str) and "://" not in ds:
        if ds and not any(c.isspace() for c in ds):
            raise SchemaRelativeMetaschemaError(ds,
                                                filePath=schema_display)
        from jsonschema_ray.spec.clierrors import SchemaKeywordError

        raise SchemaKeywordError(
            "The dialect is not a valid URI", value=ds,
            keyword="$schema", filePath=schema_display)
    if isinstance(schema, dict) and "$schema" not in schema and not dd:
        raise SchemaUnknownBaseDialectError(filePath=schema_display)
    if isinstance(schema, bool) and not dd:
        raise SchemaUnknownBaseDialectError(filePath=schema_display)

    # ---- resolver registry -------------------------------------------
    from jsonschema_ray.cli import _load_resolve_docs

    _flag_exts = getattr(args, "extension", None)
    _res_exts = None
    if _flag_exts or (cfg or {}).get("extension"):
        import io

        from jsonschema_ray.state.inputs import resolve_extensions

        # silent pre-resolution for the --resolve dir walk only; the
        # instance walk owns the user-facing warning/verbose lines
        _res_exts = resolve_extensions(
            _flag_exts, cfg, verbose=False, log=io.StringIO())
    resources = dict(_load_resolve_docs(
        getattr(args, "resolve", None) or [],
        schema_display if schema_arg != "-" else os.getcwd(),
        debug=getattr(args, "debug", False),
        extensions=_res_exts) or {})
    for r_uri, r_target in ((cfg or {}).get("resolve") or {}).items():
        tfile = str(r_target).replace("file://", "", 1)
        if os.path.isfile(tfile):
            try:
                resources[r_uri.rstrip("#")] = _read_entry(
                    os.path.realpath(tfile)).parsed()
            except Exception:   # noqa: BLE001 — broken remap: skip
                pass
    if cfg is not None and getattr(args, "resolve", None) \
            and (getattr(args, "verbose", False)
                 or getattr(args, "debug", False)):
        from jsonschema_ray.state.inputs import resolve_extensions

        resolve_extensions(None, cfg, verbose=True, log=sys.stderr)
    # URI→URI config remaps resolve through already-registered docs
    for r_uri, r_target in ((cfg or {}).get("resolve") or {}).items():
        t = str(r_target)
        if "://" in t and t.rstrip("#") in resources:
            resources.setdefault(r_uri.rstrip("#"),
                                 resources[t.rstrip("#")])
    for dep_uri, dep_path in ((cfg or {}).get("dependencies")
                              or {}).items():
        full = dep_path if os.path.isabs(dep_path) else os.path.join(
            (cfg or {}).get("_dir", "."), dep_path)
        if os.path.isfile(full):
            try:
                ddoc = _read_entry(os.path.realpath(full)).parsed()
            except Exception:   # noqa: BLE001
                continue
            resources.setdefault(dep_uri.rstrip("#"), ddoc)
            if isinstance(ddoc, dict) and isinstance(ddoc.get("$id"),
                                                     str):
                resources.setdefault(ddoc["$id"].rstrip("#"), ddoc)
    if dd_meta is not None and isinstance(dd_meta, dict) \
            and isinstance(dd_meta.get("$id"), str):
        resources.setdefault(dd_meta["$id"].rstrip("#"), dd_meta)
        dd = dd_meta["$id"]
    # sibling files resolve by relative path (pass_no_identifier_ref)
    # and embedded resources self-register inside the Explainer's
    # resolution via the registry
    def _register_embedded(node):
        if isinstance(node, dict):
            nid = node.get("$id")
            if isinstance(nid, str) and "://" in nid:
                resources.setdefault(nid.rstrip("#"), node)
            for v in node.values():
                _register_embedded(v)
        elif isinstance(node, list):
            for v in node:
                _register_embedded(v)

    _register_embedded(schema)
    for rdoc in list(resources.values()):
        _register_embedded(rdoc)

    # resolve external refs transitively: registry hit, disk file
    # (sibling-relative), live fetch under --http, else the
    # reference's unresolvable-ref error
    _resolve_external_refs(schema, schema_default_id, resources,
                           schema_display,
                           http=getattr(args, "http", False),
                           headers=getattr(args, "header", None))

    # compile-time regex strictness (fail_invalid_regex exit 4)
    _check_regexes(schema, schema_display,
                   schema_base_dir if schema_arg != "-" else os.getcwd(),
                   schema_default_id)

    # pre-imported files carry their own strictness with THEIR file as
    # the error context (fail_resolve_unknown_dialect etc.)
    from jsonschema_ray.spec.jschema import compile_schema

    _all_resolved = dict(resources) if False else None
    for rp in getattr(args, "resolve", None) or []:
        if not os.path.isfile(rp):
            continue
        rentry = _read_entry(os.path.realpath(rp))
        try:
            compile_schema(rentry.parsed(), resources=resources)
        except CLIError as rerr:
            from types import SimpleNamespace

            from jsonschema_ray.cli import _stamp_fmt_error

            # a per-resource strictness error belongs to the resource
            # that declared the broken dialect chain, not whichever
            # pre-import compile surfaced it first
            off = getattr(rerr, "_offending_id", None)
            if off:
                for rp2 in getattr(args, "resolve", None) or []:
                    if not os.path.isfile(rp2):
                        continue
                    r2 = _read_entry(os.path.realpath(rp2))
                    d2 = r2.parsed()
                    if isinstance(d2, dict) and (
                            d2.get("$id") or d2.get("id")) == off:
                        rentry = r2
                        break
            raise _stamp_fmt_error(rerr, SimpleNamespace(
                text=rentry.text, path=rentry.path)) from rerr


    probe = schema
    if isinstance(schema, dict):
        probe = dict(schema)
        if "$id" not in probe and "id" not in probe:
            probe["$id"] = schema_default_id
        if "$schema" not in probe and dd and "://" in dd:
            probe["$schema"] = dd
    try:
        compile_schema(probe, resources={
            k: v for k, v in resources.items()},
            assert_formats=getattr(args, "format_assertion", False)
            or None)
    except CLIError as cerr:
        from types import SimpleNamespace

        from jsonschema_ray.cli import _stamp_fmt_error

        raise _stamp_fmt_error(cerr, SimpleNamespace(
            text=sentry.text, path=schema_display)) from cerr

    # entrypoint resolution (-e URI-or-pointer)
    entry_schema = schema
    entry_lex_prefix = ""
    ep = getattr(args, "entrypoint", None)
    if ep:
        sid0 = schema.get("$id") if isinstance(schema, dict) else None
        ep_base = sid0.rstrip("#") if isinstance(sid0, str) \
            and "://" in sid0 else schema_default_id
        entry_schema = _resolve_entrypoint(schema, ep, schema_display,
                                           resources, ep_base)
        entry_lex_prefix = ep.lstrip("#")

    explainer = Explainer(
        resources,
        assert_formats=getattr(args, "format_assertion", False)
        or _schema_opts_in_formats(schema))
    schema_base = schema_default_id
    if isinstance(schema, dict):
        sid = schema.get("$id") or schema.get("id")
        if isinstance(sid, str) and "://" in sid:
            schema_base = sid.rstrip("#")

    # ---- instances -----------------------------------------------------
    wopts = WalkOptions(extensions=getattr(args, "extension", None),
                        ignores=getattr(args, "ignore", None),
                        verbose=getattr(args, "verbose", False),
                        debug=getattr(args, "debug", False))

    docs: list[_Doc] = []
    if not instances:
        if trace:
            single_only("--trace/-t")
        if bench:
            single_only("--benchmark/-b")
        for e in walk_inputs([], wopts):
            docs.append(_Doc(e.path, e.parsed(),
                             _spans_for(e.text, e.yaml), walked=True))
    else:
        for ipath in instances:
            if ipath == "-":
                e = read_stdin_entry()
                docs.append(_Doc("/dev/stdin", e.parsed(),
                                 _spans_for(e.text, e.yaml),
                                 walked=True))
            elif ipath.endswith(".jsonl") or ipath.endswith(".jsonl.gz"):
                rp = os.path.realpath(ipath)
                if not os.path.isfile(ipath):
                    raise NoSuchFileError(rp)
                if getattr(args, "verbose", False) \
                        or getattr(args, "debug", False):
                    kindtxt = ("GZIP-compressed JSONL"
                               if rp.endswith(".gz") else "JSONL")
                    print(f"Interpreting input as {kindtxt}: {rp}",
                          file=sys.stderr)
                entries = list(_iter_jsonl(ipath, rp))
                if not entries:
                    print("warning: The JSONL file is empty",
                          file=sys.stderr)
                docs.extend(entries)
            elif os.path.isdir(ipath):
                for e in walk_inputs([ipath], wopts):
                    docs.append(_Doc(e.path, e.parsed(),
                                     _spans_for(e.text, e.yaml),
                                     walked=True))
            elif ipath.endswith((".yaml", ".yml")):
                rp = os.path.realpath(ipath)
                if not os.path.isfile(ipath):
                    raise NoSuchFileError(rp)
                ydocs = _iter_yaml_docs(rp)
                if (getattr(args, "verbose", False)
                        or getattr(args, "debug", False)) \
                        and any(d.multidocument for d in ydocs):
                    print(f"Interpreting input as YAML multi-document: "
                          f"{rp}", file=sys.stderr)
                docs.extend(ydocs)
            else:
                if os.path.isfile(ipath):
                    e = _read_entry(os.path.realpath(ipath))
                    docs.append(_Doc(e.path, e.parsed(),
                                     _spans_for(e.text, e.yaml)))
                elif os.path.exists(ipath):
                    # process substitution / fifo: readable, not a file
                    e = _read_entry(ipath)
                    docs.append(_Doc(ipath, e.parsed(),
                                     _spans_for(e.text, e.yaml)))
                else:
                    raise NoSuchFileError(os.path.realpath(ipath))

    result = True
    verbose = getattr(args, "verbose", False) or getattr(
        args, "debug", False)

    def expand(item):
        yield item

    for item in docs:
        stop = False
        for doc in expand(item):
            ok, errs = explainer.validate(
                entry_schema, doc.value, schema_base,
                trace=trace, default_dialect=dd,
                lex_prefix=entry_lex_prefix,
                fast=fast and trace)
            if bench:
                avg = _bench_loop(explainer, entry_schema, doc.value,
                                  schema_base, dd, loop)
                idx = f"[{doc.index + 1}]" if doc.multidocument else ""
                print(f"{doc.label}{idx}: "
                      f"{'PASS' if ok else 'FAIL'} {avg[0]:.3f} +- "
                      f"{avg[1]:.3f} us ({avg[2]:.3f})")
                if not ok:
                    print("error: Schema validation failure",
                          file=sys.stderr)
                    result = False
                continue
            if trace:
                from jsonschema_ray.cli import _render_trace

                sys.stdout.write(_render_trace(
                    explainer._trace, doc.spans,
                    schema.get("$schema") if isinstance(schema, dict)
                    and isinstance(schema.get("$schema"), str) else dd))
                result = result and ok
                continue
            if json_mode:
                if not doc.multidocument and doc.walked:
                    print(doc.label, file=sys.stderr)
                from jsonschema_ray.spec.format import prettify_json

                if fast:
                    obj = {"valid": ok}
                elif ok:
                    obj = {"valid": True}
                    annos = [_std_annotation(a, doc.spans)
                             for a in explainer.annotations()]
                    if annos:
                        obj["annotations"] = annos
                else:
                    obj = {"valid": False,
                           "errors": [_std_error(e, doc.spans)
                                      for e in errs]}
                print(prettify_json(obj))
                if not ok:
                    result = False
                    if doc.multidocument and not cont:
                        stop = True
                        break
                continue
            if ok:
                if verbose:
                    if cont and doc.multidocument and not result:
                        print("", file=sys.stderr)
                    tag = (f" (entry #{doc.index + 1})"
                           if doc.multidocument else "")
                    print(f"ok: {doc.label}{tag}\n  matches "
                          f"{schema_display}", file=sys.stderr)
                    _print_annotations(explainer, doc, verbose)
            else:
                if cont and doc.multidocument and not result:
                    print("", file=sys.stderr)
                if doc.multidocument:
                    from jsonschema_ray.spec.format import prettify_json

                    sys.stderr.write(
                        f"fail: {doc.label} (entry #{doc.index + 1})"
                        f"\n\n{prettify_json(doc.value)}\n\n")
                else:
                    print(f"fail: {doc.label}", file=sys.stderr)
                if fast:
                    print("error: Schema validation failure",
                          file=sys.stderr)
                else:
                    sys.stderr.write(_render_failure(errs, doc.spans))
                result = False
                if doc.multidocument and not cont:
                    stop = True
                    break
        if stop:
            break

    from jsonschema_ray.cli import EXIT_OK, EXIT_VALIDATION

    return EXIT_OK if result else EXIT_VALIDATION


def _print_annotations(explainer, doc, verbose: bool) -> None:
    """print_annotations (src/utils.h): verbose-only annotation dump
    in EMISSION order (SimpleOutput keeps a plain vector)."""
    if not verbose:
        return
    from jsonschema_ray.spec.describe import _stringify

    for ep, iptr, value in explainer._annos:
        print(f'annotation: {_stringify(value)}', file=sys.stderr)
        loc = f'  at instance location "{iptr}"'
        span = doc.spans.get(iptr)
        if span:
            loc += f" (line {span[0]}, column {span[1]})"
        print(loc, file=sys.stderr)
        print(f'  at evaluate path "{ep}"', file=sys.stderr)


def _schema_opts_in_formats(schema) -> bool:
    """x-format-assertion / format-assertion vocabulary opt-in."""
    if not isinstance(schema, dict):
        return False
    if schema.get("x-format-assertion") is True:
        return True
    return False


def _bench_loop(explainer, schema, value, base, dd, loop: int):
    empty = 0.0
    for _ in range(loop):
        a = time.perf_counter_ns()
        b = time.perf_counter_ns()
        empty += (b - a) / 1000.0
    empty /= loop
    total = total2 = 0.0
    for _ in range(loop):
        a = time.perf_counter_ns()
        explainer.validate(schema, value, base, default_dialect=dd)
        b = time.perf_counter_ns()
        d = max(0.0, (b - a) / 1000.0 - empty)
        total += d
        total2 += d * d
    avg = total / loop
    stdev = 0.0 if loop == 1 else (total2 / loop - avg * avg) ** 0.5
    return avg, stdev, empty


def _resolve_entrypoint(schema, ep: str, schema_display: str,
                        resources: dict, ep_base: str = ""):
    """-e URI-or-pointer: the subschema to validate against
    (resolve_entrypoint in utils.h; bad pointers/URIs exit 4)."""
    from jsonschema_ray.spec.clierrors import (EXIT_SCHEMA_INPUT,
                                               CLIError)

    def bad(identifier: str) -> CLIError:
        err = CLIError("The given entry point URI does not exist in "
                       "the schema", identifier=identifier,
                       filePath=schema_display)
        err.exit_code = EXIT_SCHEMA_INPUT
        err.hint = ("Use the `inspect` command to find valid schema "
                    "locations")
        return err

    target = None
    if ep.startswith("/") or ep.startswith("#/"):
        ptr = ep.lstrip("#")
        qualified = f"{ep_base}#{ptr}" if ep_base else ep
        node = schema
        for tok in ptr.lstrip("/").split("/") if ptr.strip("/") else []:
            tok = tok.replace("~1", "/").replace("~0", "~")
            if isinstance(node, list):
                try:
                    node = node[int(tok)]
                except (ValueError, IndexError) as exc:
                    raise bad(qualified) from exc
            elif isinstance(node, dict) and tok in node:
                node = node[tok]
            else:
                raise bad(qualified)
        target = node
    else:
        if any(c.isspace() for c in ep):
            err = CLIError("The given entry point is not a valid URI "
                           "or JSON Pointer", identifier=ep,
                           filePath=schema_display)
            err.exit_code = EXIT_SCHEMA_INPUT
            err.hint = ("Use the `inspect` command to find valid "
                        "schema locations")
            raise err
        doc = resources.get(ep.rstrip("#"))
        if doc is None and "#" in ep:
            base, _, frag = ep.partition("#")
            doc = resources.get(base.rstrip("#"))
            if doc is not None and frag:
                return _resolve_entrypoint(doc, "#" + frag,
                                           schema_display, resources)
        if doc is None:
            raise bad(ep)
        target = doc
    if not isinstance(target, (dict, bool)):
        raise bad(ep)
    return target


def _resolve_external_refs(doc, default_id: str, resources: dict,
                           schema_display: str, _depth: int = 0, *,
                           http: bool = False,
                           headers: list | None = None) -> None:
    from urllib.parse import urljoin

    from jsonschema_ray.spec.clierrors import ExternalRefError
    from jsonschema_ray.state.inputs import _read_entry

    if _depth > 16 or not isinstance(doc, (dict, list)):
        return

    def fetch_remote(dbase: str, ptr: str):
        # --http: live resolution of remote $refs, reference
        # resolver.h CustomResolver::operator() → fetch_schema →
        # http_fetch (headers attached, YAML by content-type, strict
        # JSON otherwise). Failure surfaces mirror the reference's
        # test/ci expectations: non-200 → exit 6 with the uri; a
        # non-JSON body → "Failed to parse the JSON document"
        # (exit 6); a fetched document that is not a schema →
        # "The JSON document is not a valid JSON Schema" (exit 4)
        # anchored at the referencing keyword's location.
        import json as _json

        from jsonschema_ray.sources.fetch import (FetchStatusError,
                                                  fetch_schema)
        from jsonschema_ray.spec.clierrors import (EXIT_OTHER_INPUT,
                                                   EXIT_SCHEMA_INPUT,
                                                   JSONParseError)
        try:
            sub = fetch_schema(dbase, headers=headers)
        except FetchStatusError:
            err = CLIError("Failed to fetch schema")
            err.fields = {"uri": dbase}
            err.exit_code = EXIT_OTHER_INPUT
            raise err from None
        except _json.JSONDecodeError as exc:
            raise JSONParseError(exc.lineno, exc.colno) from None
        except OSError:
            err = CLIError("Failed to fetch schema")
            err.fields = {"uri": dbase}
            err.exit_code = EXIT_OTHER_INPUT
            raise err from None
        if not isinstance(sub, (dict, bool)):
            err = CLIError(
                "The JSON document is not a valid JSON Schema")
            err.fields = {"identifier": dbase,
                          "filePath": schema_display,
                          "location": ptr}
            err.exit_code = EXIT_SCHEMA_INPUT
            raise err
        return sub

    def walk(node, base, ptr):
        if isinstance(node, dict):
            nid = node.get("$id") or node.get("id")
            if isinstance(nid, str) and "://" in urljoin(base, nid):
                base = urljoin(base, nid)
            ref = node.get("$ref")
            if isinstance(ref, str) and not ref.startswith("#"):
                dest = urljoin(base, ref)
                dbase = dest.partition("#")[0].rstrip("/")
                if dbase and dbase.rstrip("#") not in resources \
                        and not dbase.startswith(
                            ("https://json-schema.org/",
                             "http://json-schema.org/")):
                    if dbase.startswith("file://"):
                        fpath = dbase[len("file://"):]
                        if os.path.isfile(fpath):
                            sub = _read_entry(
                                os.path.realpath(fpath)).parsed()
                            resources[dbase.rstrip("#")] = sub
                            _resolve_external_refs(
                                sub, dbase, resources, schema_display,
                                _depth + 1, http=http, headers=headers)
                        else:
                            err = ExternalRefError(
                                dbase, filePath=schema_display)
                            err.hint = ("This is likely because the "
                                        "file does not exist")
                            raise err
                    elif http and dbase.startswith(("http://",
                                                    "https://")):
                        sub = fetch_remote(dbase, f"{ptr}/$ref")
                        resources[dbase.rstrip("#")] = sub
                        _resolve_external_refs(
                            sub, dbase, resources, schema_display,
                            _depth + 1, http=http, headers=headers)
                    else:
                        raise ExternalRefError(dbase,
                                               filePath=schema_display)
            for k, val in node.items():
                if k in ("enum", "const"):
                    continue
                walk(val, base, f"{ptr}/{_esc_ptr(k)}")
        elif isinstance(node, list):
            for i, val in enumerate(node):
                walk(val, base, f"{ptr}/{i}")

    walk(doc, default_id, "")


def _esc_ptr(s: str) -> str:
    return s.replace("~", "~0").replace("/", "~1")


def _check_regexes(doc, schema_display: str, base_dir: str,
                   default_id: str) -> None:
    import re as _re

    from jsonschema_ray.spec.clierrors import EXIT_SCHEMA_INPUT

    def bad(pattern: str, loc: str):
        err = CLIError("Invalid regular expression")
        err.fields = {"regex": pattern, "filePath": schema_display,
                      "location": loc, "baseURI": default_id}
        err.exit_code = EXIT_SCHEMA_INPUT
        err.hint = ("Detailed regex error messages are not yet "
                    "supported\n"
                    "Try tools like https://regex101.com to debug "
                    "further")
        return err

    def walk(node, ptr):
        if isinstance(node, dict):
            from jsonschema_ray.spec.ecmaregex import (
                UnsupportedRegexError, ecma_compile)

            # UnsupportedRegexError (PCRE2-valid but inexpressible in
            # Python re, e.g. mixed-length lookbehind) surfaces here as
            # the invalid-regex error rather than crashing — a
            # documented divergence, never a silent semantic shift
            pat = node.get("pattern")
            if isinstance(pat, str):
                try:
                    ecma_compile(pat)
                except (_re.error, UnsupportedRegexError):
                    raise bad(pat, f"{ptr}/pattern") from None
            pp = node.get("patternProperties")
            if isinstance(pp, dict):
                for p in pp:
                    try:
                        ecma_compile(p)
                    except (_re.error, UnsupportedRegexError):
                        esc = p.replace("~", "~0").replace("/", "~1")
                        raise bad(
                            p, f"{ptr}/patternProperties/{esc}"
                            ) from None
            for k, val in node.items():
                if k in ("enum", "const"):
                    continue
                esc = k.replace("~", "~0").replace("/", "~1")
                walk(val, f"{ptr}/{esc}")
        elif isinstance(node, list):
            for i, val in enumerate(node):
                walk(val, f"{ptr}/{i}")

    walk(doc, "")


def _iter_yaml_docs(path: str) -> list:
    """YAML instances via the for_each_json path: `---` multi-document
    files become indexed entries (src/input.h:339-399)."""
    import yaml

    from jsonschema_ray.spec.positions import yaml_pointer_positions

    with open(path, encoding="utf-8") as f:
        text = f.read()
    values = list(yaml.safe_load_all(text))
    if len(values) <= 1:
        spans = {}
        try:
            spans = yaml_pointer_positions(text)
        except Exception:   # noqa: BLE001
            pass
        return [_Doc(path, values[0] if values else None, spans,
                     walked=True)]
    from jsonschema_ray.spec.positions import yaml_node_positions

    try:
        span_sets = [yaml_node_positions(n)
                     for n in yaml.compose_all(text)]
    except Exception:   # noqa: BLE001
        span_sets = [{} for _ in values]
    return [_Doc(path, v, span_sets[i] if i < len(span_sets) else {},
                 index=i, multidocument=True, walked=True)
            for i, v in enumerate(values)]
