"""Reference-parity driver for the ``lint`` verb.

Executes ``src/command_lint.cc`` verbatim over the lint rule registry
(``spec/lintrules.py``): config-aware input walk, custom rules
(``--rule``/``--top-level-rule`` + ``lint.rules`` config entries),
``--exclude``/``--only`` filtering, ``--list``, text/JSON finding
output with file positions, ``--fix`` with progress dots and atomic
rewrites (``--format``/``--keep-ordering``), health scores, and the
reference's typed error surface / exit codes.
"""

from __future__ import annotations

import json
import os
import re
import sys
from typing import Any

from jsonschema_ray.spec import lintrules as LR
from jsonschema_ray.spec.clierrors import (EXIT_FAIL, CLIArgumentError,
                                           CLIError, emit)

EXIT_OK = 0
from jsonschema_ray.spec.lintframe import ptr_str
from jsonschema_ray.spec.lintrules import (BrokenReferenceError,
                                           ProcessedTwiceError, Result,
                                           Rule, SchemaAbortError)
from jsonschema_ray.state.inputs import InputEntry, WalkOptions, walk_inputs


class OptionConflictError(CLIError):
    def __init__(self, message: str):
        super().__init__(message)
        self.exit_code = 5


class InvalidLintRuleError(CLIError):
    def __init__(self, message: str, name: str):
        super().__init__(message)
        self.exit_code = 5
        self.fields = {"rule": name}


_NAME_RE = re.compile(r"^[a-z0-9_/]+$")


class CustomRuleError(CLIError):
    def __init__(self, message: str, path: str, **fields):
        super().__init__(message)
        self.exit_code = 6
        self.fields = {"filePath": path, **fields}


class SchemaRule(Rule):
    """blaze SchemaRule (schema_rule.cc): a rule defined AS a schema;
    a subschema that fails to validate against it is a finding."""

    reframe = False
    mutates = False

    def __init__(self, rule_schema: dict, path: str,
                 resources: dict | None, default_dialect: str | None,
                 assert_formats: bool, top_level: bool):
        if not isinstance(rule_schema, dict) \
                or "title" not in rule_schema:
            raise CustomRuleError(
                "The schema rule is missing a title", path)
        title = rule_schema["title"]
        if not isinstance(title, str):
            raise CustomRuleError(
                "The schema rule title is not a string", path,
                identifier=json.dumps(title))
        if not title:
            raise CustomRuleError(
                "The schema rule name must not be empty", path)
        if not _NAME_RE.fullmatch(title):
            raise CustomRuleError(
                "The schema rule name does not match the required "
                "pattern", path, identifier=title,
                regex="^[a-z0-9_/]+$")
        self.name = title
        desc = rule_schema.get("description")
        if desc is None:
            self.message = "<no description>"
        elif isinstance(desc, str):
            self.message = desc
        else:
            self.message = json.dumps(desc, separators=(", ", ": "))
        self.top_level = top_level
        self.path = path
        self.rule_schema = rule_schema
        # compile eagerly: invalid rule schemas reject at load time
        from jsonschema_ray.spec.jschema import compile_schema

        doc = rule_schema
        if "$schema" not in doc and default_dialect:
            doc = dict(doc)
            doc["$schema"] = default_dialect
        try:
            compile_schema(doc, resources=resources or None,
                           assert_formats=assert_formats)
        except CLIError as err:
            ident = err.fields.get("identifier", "")
            if "Could not resolve schema reference" in err.message \
                    and "://" in str(ident):
                from jsonschema_ray.spec.clierrors import ExternalRefError

                raise ExternalRefError(
                    str(ident).partition("#")[0], filePath=path) from err
            raise err.with_fields(filePath=path) \
                if "filePath" not in err.fields else err
        except ValueError as err:
            m = re.search(r"external \$ref not supported \(no network\): "
                          r"'([^']+)'", str(err))
            if m:
                from jsonschema_ray.spec.clierrors import ExternalRefError

                raise ExternalRefError(
                    m.group(1).partition("#")[0], filePath=path) from err
            raise
        from jsonschema_ray.spec.describe import Explainer

        self._explainer = Explainer(resources=resources,
                                    assert_formats=assert_formats)
        self._doc = doc
        self._default_dialect = default_dialect

    def condition(self, ctx):
        if self.top_level and ctx.location.pointer != ():
            return False
        ok, out = self._explainer.validate(
            self._doc, ctx.schema,
            default_dialect=self._default_dialect)
        if ok:
            return False
        if out:
            first = out[0]
            locs = [()] if not first.instance_location \
                else [tuple(LR.ptr_tokens(first.instance_location))]
            if locs == [()]:
                return Result(True, [], first.message)
            return Result(True, locs, first.message)
        return True


def _reindent(value: str, indentation: str) -> str:
    if not value:
        return ""
    out = [indentation]
    for i, ch in enumerate(value):
        out.append(ch)
        if ch == "\n" and i != len(value) - 1:
            out.append(indentation)
    return "".join(out)


def _display_path(entry: InputEntry) -> str:
    if entry.from_stdin:
        return "/dev/stdin"
    return os.path.relpath(entry.path)


def _positions_of(entry: InputEntry):
    from jsonschema_ray.spec.positions import (pointer_positions,
                                               yaml_pointer_positions)

    try:
        if entry.yaml:
            return yaml_pointer_positions(entry.text)
        return pointer_positions(entry.text)
    except Exception:   # noqa: BLE001 — positions are best-effort
        return {}


def _make_callback(state: dict, entry: InputEntry, positions,
                   json_mode: bool, fixing: bool):
    def callback(pointer, name, message, result: Result, applied):
        if fixing and applied:
            if not json_mode:
                sys.stderr.write(".")
                sys.stderr.flush()
                state["printed_progress"] = True
            return
        if state.get("printed_progress"):
            sys.stderr.write("\n")
            state["printed_progress"] = False
        locations = result.locations or [()]
        for location in locations:
            schema_location = pointer + tuple(location)
            pos = positions.get(ptr_str(schema_location))
            if json_mode:
                state["errors"].append({
                    "path": entry.path,
                    "id": name,
                    "message": message,
                    "description": result.description,
                    "schemaLocation": list(schema_location),
                    "position": list(pos) if pos else None,
                })
                continue
            w = sys.stdout.write
            w(_display_path(entry))
            if pos:
                w(f":{pos[0]}:{pos[1]}")
            else:
                w(":<unknown>:<unknown>")
            w(":\n")
            w(f"  {message} ({name})\n")
            w(f'    at location "{ptr_str(schema_location)}"\n')
            if result.description:
                w(_reindent(result.description, "    "))
                if not result.description.endswith("\n"):
                    w("\n")
    return callback


def _load_doc_for_rule(path: str) -> Any:
    from jsonschema_ray.spec.clierrors import JSONParseError
    from jsonschema_ray.state.inputs import _read_entry

    entry = _read_entry(path)
    try:
        return entry.parsed()
    except JSONParseError as err:
        # the reference's JSON parser reports literal mismatches at the
        # diverging character (core parser), not at the token start
        text = entry.text
        i = 0
        while i < len(text) and text[i] in " \t\r\n":
            i += 1
        lit = {"t": "true", "f": "false", "n": "null"}.get(text[i:i + 1])
        if lit is not None and err.fields.get("column") == 1 \
                and err.fields.get("line") == 1:
            j = 0
            while j < len(lit) and i + j < len(text) \
                    and text[i + j] == lit[j]:
                j += 1
            raise err.with_fields(column=i + j + 1) from None
        raise


def _resolver_for(entry_or_path, resolves: list[str],
                  config: dict | None, config_path: str | None,
                  debug: bool = False):
    if not hasattr(_resolver_for, "_debug_seen"):
        _resolver_for._debug_seen = set()
    """Build the resolution context: --resolve docs + config resolve
    remaps. Official metaschemas resolve natively in compile_schema and
    the Explainer adds its own registry."""
    resources: dict[str, Any] = {}
    base_dir = os.getcwd()

    def load_into(p: str):
        paths = [p]
        if os.path.isdir(p):
            paths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(p)
                for n in ns if n.endswith((".json", ".yaml", ".yml")))
        for fp in paths:
            ap = os.path.realpath(fp)
            dbg = debug and ap not in _resolver_for._debug_seen
            if dbg:
                _resolver_for._debug_seen.add(ap)
                print(f"debug: Detecting schema resources from file: "
                      f"{ap}", file=sys.stderr)
            try:
                doc = _load_doc_for_rule(fp)
            except Exception:   # noqa: BLE001
                continue
            if dbg:
                print(f"debug: Importing schema into the resolution "
                      f"context: file://{ap}", file=sys.stderr)
            resources[f"file://{ap}"] = doc
            resources[ap] = doc
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    if dbg:
                        print(f"debug: Importing schema into the "
                              f"resolution context: {did}",
                              file=sys.stderr)
                    resources.setdefault(did, doc)

    for r in resolves or []:
        load_into(os.path.join(base_dir, r))
    for src_uri, target in ((config or {}).get("resolve") or {}).items():
        tp = os.path.normpath(os.path.join(
            os.path.dirname(config_path or "."), str(target)))
        try:
            doc = _load_doc_for_rule(tp)
        except Exception:   # noqa: BLE001
            continue
        resources[src_uri] = doc

    def resolver(uri: str):
        return resources.get(uri) or resources.get(uri.rstrip("#"))

    return resolver, resources


def _explain_factory(entry: InputEntry, resources: dict,
                     assert_formats: bool):
    """valid_default/valid_examples evaluator: validate ``instance``
    against the CURRENT subschema (refs resolve against the whole
    document), returning (message, instance_location, evaluate_path)
    rows."""
    from jsonschema_ray.spec.describe import Explainer

    def explain(ctx, instance):
        from urllib.parse import urljoin as _uj

        from jsonschema_ray.spec.clierrors import SchemaReferenceError
        from jsonschema_ray.spec.jschema import (_dialect_ver,
                                                 check_pointer_frames)

        # compiling the subschema resolves its refs through the walker:
        # a pointer through a non-schema position is a hard error
        # (CompilerReferenceTargetNotSchemaError), not a skip
        display = os.path.realpath(entry.path) if not entry.from_stdin \
            else entry.path
        root_ver = _dialect_ver(ctx.root) if isinstance(ctx.root, dict) \
            else 2020

        def check_refs(node, ptr):
            if isinstance(node, list):
                for i, v in enumerate(node):
                    check_refs(v, f"{ptr}/{i}")
                return
            if not isinstance(node, dict):
                return
            rv = node.get("$ref")
            if isinstance(rv, str) and "#/" in rv:
                dest = _uj(ctx.location.base or "", rv)
                dest_base, _, frag = dest.partition("#")
                if dest_base == (ctx.location.base or "").partition(
                        "#")[0] and frag.startswith("/"):
                    try:
                        check_pointer_frames(ctx.root, "", frag,
                                             root_ver,
                                             base_uri=dest_base,
                                             from_ptr=ptr)
                    except SchemaReferenceError as err:
                        raise err.with_fields(filePath=display)
                    except Exception:   # noqa: BLE001 — findings
                        pass
            for k, v in node.items():
                esc = k.replace("~", "~0").replace("/", "~1")
                check_refs(v, f"{ptr}/{esc}")

        check_refs(ctx.schema, LR.ptr_str(ctx.location.pointer))
        sub = ctx.schema
        doc_resources = dict(resources)
        root_id = None
        if isinstance(ctx.root, dict):
            root_id = ctx.root.get("$id") or ctx.root.get("id")
        if isinstance(root_id, str):
            doc_resources[root_id] = ctx.root
        if ctx.location.base:
            doc_resources[ctx.location.base] = \
                LR.try_get_at(ctx.root, ()) if not ctx.location.pointer \
                else ctx.root
            doc_resources.setdefault(ctx.location.base.rstrip("#"),
                                     ctx.root)
        ex = Explainer(resources=doc_resources,
                       assert_formats=assert_formats)
        schema_doc = sub
        if isinstance(sub, dict) and "$schema" not in sub:
            schema_doc = dict(sub)
            schema_doc["$schema"] = ctx.location.dialect
        try:
            ok, out = ex.validate(schema_doc, instance,
                                  base_uri=ctx.location.base or "")
        except Exception:   # noqa: BLE001 — uncompilable: rule skips
            return None
        if ok:
            return None
        return [(e.message, e.instance_location, e.evaluate_path)
                for e in out]

    return explain


_URI_SPACE = re.compile(r"\s")

_OFFICIAL_DIALECT_PREFIXES = (
    "http://json-schema.org/", "https://json-schema.org/")


def _eager_checks(entry: InputEntry, resources: dict,
                  default_dialect: str | None,
                  default_id: str = "") -> None:
    """The frame-analysis error surface (command_lint.cc catch blocks
    around ``bundle.check``): invalid structural keyword values,
    duplicate identifiers, anchor collisions, unknown/unresolvable
    dialects — but NOT unresolvable instance refs (those are lint
    findings, not errors)."""
    from jsonschema_ray.spec.clierrors import (SchemaAnchorCollisionError,
                                               SchemaKeywordError,
                                               SchemaResolutionError,
                                               SchemaUnknownBaseDialectError)
    from jsonschema_ray.spec.jschema import _dialect_ver

    doc = entry.parsed()
    display = os.path.realpath(entry.path) if not entry.from_stdin \
        else entry.path

    def kw_err(message, value, keyword):
        if not isinstance(value, str):
            value = json.dumps(value)
        raise SchemaKeywordError(message, value=value, keyword=keyword,
                                 filePath=display)

    if isinstance(doc, bool):
        return
    if not isinstance(doc, dict):
        raise SchemaUnknownBaseDialectError(filePath=display)

    root_dialect = doc.get("$schema")
    if "$schema" in doc and not isinstance(root_dialect, str):
        kw_err("The dialect value is invalid", root_dialect, "$schema")
    if not isinstance(root_dialect, str):
        root_dialect = default_dialect
    if not isinstance(root_dialect, str):
        raise SchemaUnknownBaseDialectError(filePath=display)

    embedded_ids: dict[str, Any] = {}

    def _collect_ids(node):
        if isinstance(node, dict):
            did = node.get("$id") or node.get("id")
            if isinstance(did, str):
                embedded_ids.setdefault(did.rstrip("#"), node)
            for v in node.values():
                _collect_ids(v)
        elif isinstance(node, list):
            for v in node:
                _collect_ids(v)

    _collect_ids(doc)

    def resolve_dialect(uri: str) -> None:
        seen = set()
        while True:
            if uri in seen:
                return
            seen.add(uri)
            if _URI_SPACE.search(uri):
                kw_err("The dialect is not a valid URI", uri, "$schema")
            if any(uri.startswith(p) for p in _OFFICIAL_DIALECT_PREFIXES):
                return
            if uri.startswith("https://spec.openapis.org/oas/"):
                return
            meta = resources.get(uri) or resources.get(uri.rstrip("#")) \
                or embedded_ids.get(uri.rstrip("#"))
            if meta is None:
                raise SchemaResolutionError(uri, filePath=display)
            nxt = meta.get("$schema") if isinstance(meta, dict) else None
            if not isinstance(nxt, str):
                return
            uri = nxt

    resolve_dialect(root_dialect)
    root_ver = _dialect_ver({"$schema": root_dialect})

    seen_resources: dict[str, str] = {}
    seen_anchors: dict[str, str] = {}

    def check_node(node, ptr: str, base: str, ver: int) -> None:
        if not isinstance(node, dict):
            if isinstance(node, list):
                for i, item in enumerate(node):
                    check_node(item, f"{ptr}/{i}", base, ver)
            return
        ds = node.get("$schema")
        if "$schema" in node and not isinstance(ds, str):
            kw_err("The dialect value is invalid", ds, "$schema")
        if isinstance(ds, str) and ptr == "":
            pass   # already resolved above
        elif isinstance(ds, str):
            resolve_dialect(ds)
            ver = _dialect_ver({"$schema": ds})
        idkw = "id" if ver <= 4 else "$id"
        rid = node.get(idkw)
        if idkw in node and not isinstance(rid, (dict, list)):
            if not isinstance(rid, str):
                kw_err("The schema identifier is invalid", rid, "$id")
            elif _URI_SPACE.search(rid):
                kw_err("The identifier is not a valid URI", rid, "$id")
            elif ver >= 2019 and "#" in rid and rid.split("#", 1)[1]:
                err = CLIError(
                    "Identifiers must not contain non-empty fragments",
                    identifier=rid, filePath=display)
                err.exit_code = 4
                raise err
            elif not (ver in (6, 7) and rid.startswith("#")):
                from urllib.parse import urljoin as _uj

                uri = _uj(base or "", rid.split("#", 1)[0])
                prev = seen_resources.get(uri)
                if prev is not None and prev != ptr:
                    err = CLIError("Schema identifier already exists",
                                   identifier=uri, filePath=display)
                    err.exit_code = 4
                    raise err
                seen_resources[uri] = ptr
                base = uri
        for akw in ("$anchor", "$dynamicAnchor"):
            av = node.get(akw)
            if akw in node and ver >= 2019:
                if not isinstance(av, str) or not av:
                    kw_err("Invalid anchor value", av if av is not None
                           else json.dumps(None), akw)
                auri = f"{base}#{av}"
                prev = seen_anchors.get(auri)
                if prev is not None and prev != ptr:
                    line = column = None
                    try:
                        pos = _positions_of(entry).get(ptr)
                        if pos:
                            line, column = pos[0], pos[1]
                    except Exception:   # noqa: BLE001
                        pass
                    raise SchemaAnchorCollisionError(
                        auri, line=line, column=column,
                        filePath=display, location=ptr,
                        otherLocation=prev)
                seen_anchors[auri] = ptr
        if ver == 2019:
            ra = node.get("$recursiveAnchor")
            if "$recursiveAnchor" in node and not isinstance(ra, bool):
                kw_err("Invalid recursive anchor value", ra,
                       "$recursiveAnchor")
            rr = node.get("$recursiveRef")
            if "$recursiveRef" in node and rr != "#":
                kw_err("Invalid recursive reference value", rr,
                       "$recursiveRef")
        rv = node.get("$ref")
        if isinstance(rv, str) and _URI_SPACE.search(rv):
            kw_err("The reference is not a valid URI", rv, "$ref")
        for k, v in node.items():
            esc = k.replace("~", "~0").replace("/", "~1")
            check_node(v, f"{ptr}/{esc}", base, ver)

    check_node(doc, "", default_id, root_ver)


def run(args) -> int:
    """The lint verb. Returns the process exit code."""
    from jsonschema_ray.state.config import (find_configuration,
                                             load_configuration)

    json_mode = bool(getattr(args, "as_json", False))
    verbose = bool(getattr(args, "verbose", False)
                   or getattr(args, "debug", False))
    fixing = bool(getattr(args, "fix", False))
    format_output = bool(getattr(args, "format_output", False))
    keep_ordering = bool(getattr(args, "keep_ordering", False))

    try:
        return _run_inner(args, json_mode, verbose, fixing, format_output,
                          keep_ordering, find_configuration,
                          load_configuration)
    except CLIError as err:
        return emit(err, json_mode=json_mode)



def _check_lint_config(cfg_path: str) -> None:
    """Config-shape validation for the lint-relevant properties
    (configuration.h parse errors, exit 6, with file positions)."""
    from jsonschema_ray.state.config import _cfg_error

    with open(cfg_path) as f:
        text = f.read()
    try:
        cfg = json.loads(text)
    except json.JSONDecodeError:
        return
    if not isinstance(cfg, dict):
        return
    lint_cfg = cfg.get("lint")
    if lint_cfg is not None and not isinstance(lint_cfg, dict):
        raise _cfg_error(cfg_path, text,
                         "The lint property must be an object", "/lint")
    lint_cfg = lint_cfg if isinstance(lint_cfg, dict) else {}
    ex = lint_cfg.get("exclude")
    if ex is not None and not isinstance(ex, list):
        raise _cfg_error(cfg_path, text,
                         "The lint exclude property must be an array",
                         "/lint/exclude")
    for i, entry in enumerate(ex or []):
        if not isinstance(entry, str):
            raise _cfg_error(
                cfg_path, text,
                "The values in the lint exclude array must be strings",
                f"/lint/exclude/{i}")
    rules_cfg = lint_cfg.get("rules")
    if rules_cfg is not None and not isinstance(rules_cfg, list):
        raise _cfg_error(cfg_path, text,
                         "The lint rules property must be an array",
                         "/lint/rules")
    for i, entry in enumerate(rules_cfg or []):
        if isinstance(entry, dict):
            if not isinstance(entry.get("path"), str):
                raise _cfg_error(
                    cfg_path, text,
                    "The lint rule path property must be a string",
                    f"/lint/rules/{i}/path")
            tl = entry.get("topLevel")
            if tl is not None and not isinstance(tl, bool):
                raise _cfg_error(
                    cfg_path, text,
                    "The lint rule topLevel property must be a boolean",
                    f"/lint/rules/{i}/topLevel")
        elif not isinstance(entry, str):
            raise _cfg_error(
                cfg_path, text,
                "The values in the lint rules array must be strings or "
                "objects", f"/lint/rules/{i}")
    res = cfg.get("resolve")
    if isinstance(res, dict):
        base = os.path.dirname(os.path.abspath(cfg_path))
        for uri, target in res.items():
            if "://" in str(target):
                continue
            tp = os.path.normpath(os.path.join(base, str(target)))
            if not os.path.exists(tp):
                esc_uri = str(uri).replace("~", "~0").replace("/", "~1")
                err = _cfg_error(
                    cfg_path, text,
                    "The resolve target does not exist on the "
                    "filesystem", f"/resolve/{esc_uri}")
                err.fields = {"resolvePath": tp, **err.fields}
                raise err



def _resolve_dd_path(dd: str | None, cfg_path: str | None,
                     resources: dict) -> str | None:
    """A relative/implicit-extension defaultDialect resolves against the
    config directory to a file:// metaschema (utils.h
    resolve_relative_uri + implicit-extension probing)."""
    if not dd or "://" in dd:
        return dd
    base_dir = os.path.dirname(cfg_path) if cfg_path else os.getcwd()
    cand = os.path.normpath(os.path.join(base_dir, dd))
    if not os.path.isfile(cand):
        for ext in (".json", ".yaml", ".yml"):
            if os.path.isfile(cand + ext):
                cand = cand + ext
                break
    if not os.path.isfile(cand):
        return dd
    try:
        doc = _load_doc_for_rule(cand)
    except Exception:   # noqa: BLE001 — unresolvable dialect errors later
        return dd
    uri = "file://" + os.path.realpath(cand)
    resources[uri] = doc
    resources.setdefault(os.path.realpath(cand), doc)
    return uri


def _run_inner(args, json_mode, verbose, fixing, format_output,
               keep_ordering, find_configuration,
               load_configuration) -> int:
    from jsonschema_ray.spec.clierrors import validate_http_headers

    validate_http_headers(getattr(args, "header", None))
    rules: list[Rule] = LR.build_registry()
    rule_names = {r.name for r in rules}

    paths = list(getattr(args, "paths", None) or [])
    input_paths = [os.getcwd() if p == "-" else os.path.abspath(p)
                   for p in paths] or [os.getcwd()]

    # configuration discovery over the input paths: merge excludes,
    # load config-declared custom rules
    seen_cfgs: set = set()
    config_excludes: set = set()
    first_cfg: dict | None = None
    first_cfg_path: str | None = None
    for ip in input_paths:
        start = ip if os.path.isdir(ip) else os.path.dirname(ip)
        cfg_path = find_configuration(start)
        if cfg_path is None:
            continue
        rp = os.path.realpath(cfg_path)
        if rp in seen_cfgs:
            continue
        seen_cfgs.add(rp)
        _check_lint_config(cfg_path)
        cfg = load_configuration(cfg_path)
        if cfg is None:
            continue
        if first_cfg is None:
            first_cfg, first_cfg_path = cfg, cfg_path
        lint_cfg = cfg.get("lint") if isinstance(cfg.get("lint"), dict) \
            else {}
        for ex in (lint_cfg.get("exclude") or []):
            if isinstance(ex, str):
                config_excludes.add(ex)
        cfg_dir = os.path.dirname(cfg_path)
        dd = cfg.get("defaultDialect") \
            if isinstance(cfg.get("defaultDialect"), str) else None
        dd = getattr(args, "default_dialect", None) or dd
        resolver, resources = _resolver_for(
            None, getattr(args, "resolve", None) or [], cfg, cfg_path)
        for rule_entry in (lint_cfg.get("rules") or []):
            top = False
            p = rule_entry
            if isinstance(rule_entry, dict):
                top = rule_entry.get("topLevel") is True
                p = rule_entry.get("path")
            if not isinstance(p, str):
                continue
            rule_path = os.path.normpath(os.path.join(cfg_dir, p))
            if verbose:
                print("Loading custom rule from configuration: "
                      f"{rule_path}", file=sys.stderr)
            _load_custom_rule(rules, rule_names, rule_path, resolver,
                              resources, dd,
                              bool(getattr(args, "format_assertion",
                                           False)), top)

    dd_flag = getattr(args, "default_dialect", None)

    for flag, top in (("rule", False), ("top_level_rule", True)):
        for rp in (getattr(args, flag, None) or []):
            rule_path = os.path.abspath(rp)
            if verbose:
                print(f"Loading custom rule: {rule_path}",
                      file=sys.stderr)
            cfg_path = find_configuration(
                os.path.dirname(rule_path))
            cfg = load_configuration(cfg_path) if cfg_path else None
            dd = dd_flag or ((cfg or {}).get("defaultDialect")
                             if isinstance((cfg or {}).get(
                                 "defaultDialect"), str) else None)
            resolver, resources = _resolver_for(
                None, getattr(args, "resolve", None) or [], cfg,
                cfg_path)
            _load_custom_rule(rules, rule_names, rule_path, resolver,
                              resources, dd,
                              bool(getattr(args, "format_assertion",
                                           False)), top)

    only = list(getattr(args, "only", None) or [])
    exclude = list(getattr(args, "exclude", None) or [])
    if only:
        if exclude:
            raise OptionConflictError(
                "Cannot use --only and --exclude at the same time")
        blacklist = {r.name for r in rules}
        for o in only:
            if verbose:
                print(f"Only enabling rule: {o}", file=sys.stderr)
            if o in blacklist:
                blacklist.discard(o)
            else:
                raise InvalidLintRuleError(
                    "The following linting rule does not exist", o)
        rules = [r for r in rules if r.name not in blacklist]
    elif exclude:
        keep = []
        removed: set = set()
        for x in exclude:
            if any(r.name == x for r in rules):
                removed.add(x)
                if verbose:
                    print(f"Disabling rule: {x}", file=sys.stderr)
            else:
                print(f"warning: Cannot exclude unknown rule: {x}",
                      file=sys.stderr)
        rules = [r for r in rules if r.name not in removed]

    if not only and config_excludes:
        for x in sorted(config_excludes):
            if any(r.name == x for r in rules):
                rules = [r for r in rules if r.name != x]
                if verbose:
                    print(f"Disabling rule from configuration: {x}",
                          file=sys.stderr)

    if getattr(args, "list_rules", False):
        entries = sorted((r.name, r.message) for r in rules)
        for name, message in entries:
            sys.stdout.write(f"{name}\n  {message}\n\n")
        sys.stdout.write(f"Number of rules: {len(entries)}\n")
        return EXIT_OK

    if format_output and not fixing:
        raise OptionConflictError(
            "The --format option requires --fix to be set")
    if keep_ordering and not format_output:
        raise OptionConflictError(
            "The --keep-ordering option requires --format to be set")

    indentation = _parse_indentation(args)
    result_ok = True
    state = {"errors": [], "printed_progress": False}
    scores: list[int] = []

    entries = walk_inputs(
        paths, WalkOptions(
            extensions=getattr(args, "extension", None),
            ignores=getattr(args, "ignore", None),
            verbose=bool(getattr(args, "verbose", False)),
            debug=bool(getattr(args, "debug", False))))

    for entry in entries:
        cfg_path = None if entry.from_stdin else find_configuration(
            os.path.dirname(os.path.abspath(entry.path)))
        cfg = load_configuration(cfg_path) if cfg_path else None
        dd = dd_flag or ((cfg or {}).get("defaultDialect")
                         if isinstance((cfg or {}).get("defaultDialect"),
                                       str) else None)
        resolver, resources = _resolver_for(
            entry, getattr(args, "resolve", None) or [], cfg, cfg_path,
            debug=bool(getattr(args, "debug", False)))
        dd = _resolve_dd_path(dd, cfg_path, resources)
        if verbose:
            print(f"Linting: {entry.path}", file=sys.stderr)
        if fixing and entry.yaml:
            yerr = CLIError("The --fix option is not supported for YAML "
                            "input files", filePath=entry.path)
            yerr.exit_code = 3
            raise yerr
        doc = entry.parsed()
        assert_formats = bool(getattr(args, "format_assertion", False))
        # metaschemas embedded in the document take precedence over the
        # caller's resolver (frame.cc probed_metaschemas_)
        def _collect(node):
            if isinstance(node, dict):
                did = node.get("$id") or node.get("id")
                if isinstance(did, str):
                    resources.setdefault(did.rstrip("#"), node)
                for v in node.values():
                    _collect(v)
            elif isinstance(node, list):
                for v in node:
                    _collect(v)
        _collect(doc)
        _eager_checks(entry, resources, dd,
                      "" if entry.from_stdin else
                      "file://" + os.path.realpath(entry.path))
        positions = _positions_of(entry)
        callback = _make_callback(state, entry, positions, json_mode,
                                  fixing)
        explain = _explain_factory(entry, resources, assert_formats)
        default_id = "" if entry.from_stdin else \
            "file://" + os.path.abspath(entry.path)
        if fixing:
            holder = [doc if not isinstance(doc, dict)
                      else json.loads(entry.text)]
            try:
                ok, score = LR.apply(
                    holder, rules, callback, resolver=resolver,
                    default_dialect=dd or "", default_id=default_id,
                    explain=explain)
            except ProcessedTwiceError as err:
                if state.get("printed_progress"):
                    sys.stderr.write("\n")
                    state["printed_progress"] = False
                werr = CLIError("The transform rule was processed twice")
                werr.exit_code = 1
                werr.fields = {"filePath": entry.path}
                raise werr from err
            except BrokenReferenceError as err:
                if state.get("printed_progress"):
                    sys.stderr.write("\n")
                    state["printed_progress"] = False
                werr = CLIError(
                    "Could not autofix the schema without breaking its "
                    "internal references",
                    filePath=os.path.realpath(entry.path),
                    location=LR.ptr_str(err.origin))
                werr.exit_code = 1
                werr.hint = (
                    "This is an unexpected error, as making the auto-fix "
                    "functionality work in all\n"
                    "cases is tricky. We are working hard to improve the "
                    "auto-fixing functionality\n"
                    "to handle all possible edge cases, but for now, try "
                    "again without `--fix/-f`\n"
                    "and apply the suggestions by hand.\n"
                    "\n"
                    "Also consider consider reporting this problematic "
                    "case to the issue tracker,\n"
                    "so we can add it to the test suite and fix it:\n"
                    "\n"
                    "https://github.com/sourcemeta/jsonschema/issues")
                raise werr from err
            except (SchemaAbortError, CLIError):
                if state.get("printed_progress"):
                    sys.stderr.write("\n")
                    state["printed_progress"] = False
                raise
            if state.get("printed_progress"):
                sys.stderr.write("\n")
                state["printed_progress"] = False
            scores.append(score)
            if not ok:
                result_ok = False
            fixed = holder[0]
            from jsonschema_ray.spec.format import (prettify_json,
                                                    prettify_schema)

            if format_output and not keep_ordering:
                rendered = prettify_schema(fixed, indent=indentation,
                                           default_dialect=dd)
            else:
                rendered = prettify_json(fixed, indentation) + "\n"
            if entry.from_stdin:
                sys.stdout.write(rendered)
            elif format_output:
                if entry.text != rendered:
                    _atomic_write(entry.path, rendered)
            elif not LR.jeq(fixed, doc):
                _atomic_write(entry.path, rendered)
        else:
            ok, score = LR.check(
                doc, rules, callback, resolver=resolver,
                default_dialect=dd or "", default_id=default_id,
                explain=explain)
            scores.append(score)
            if not ok:
                result_ok = False

    if json_mode:
        errors = state["errors"]
        errors.sort(key=lambda e: (e["position"] is None,
                                   e["position"] or []))
        health = None
        if scores:
            health = sum(scores) // len(scores)
        from jsonschema_ray.spec.format import prettify_json

        doc = {"valid": result_ok, "health": health, "errors": errors}
        sys.stdout.write(prettify_json(doc, indentation) + "\n")

    return EXIT_OK if result_ok else EXIT_FAIL


def _load_custom_rule(rules: list, rule_names: set, rule_path: str,
                      resolver, resources, default_dialect,
                      assert_formats: bool, top_level: bool) -> None:
    from jsonschema_ray.spec.clierrors import NoSuchFileError

    rule_path = os.path.realpath(rule_path)
    if not os.path.isfile(rule_path):
        raise NoSuchFileError(rule_path)
    doc = _load_doc_for_rule(rule_path)
    rule = SchemaRule(doc, rule_path, resources, default_dialect,
                      assert_formats, top_level)
    if rule.name in rule_names:
        raise CustomRuleError(
            "A lint rule with this name already exists", rule_path,
            rule=rule.name)
    rule_names.add(rule.name)
    rules.append(rule)


def _parse_indentation(args) -> int:
    raw = getattr(args, "indentation", None)
    if raw is None:
        return 2
    try:
        n = int(raw)
    except (TypeError, ValueError):
        raise CLIArgumentError(
            f"Invalid indentation value: {raw}") from None
    if n <= 0:
        raise CLIArgumentError(f"Invalid indentation value: {raw}")
    return n


def _atomic_write(path: str, text: str) -> None:
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".lint-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise
