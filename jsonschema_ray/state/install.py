"""Project-mode dependency installer — the reference ``install`` verb.

Re-implements ``/root/reference/src/command_install.cc``: a project's
``jsonschema.json`` declares ``dependencies`` ({uri: relative-path});
``install <uri> <path>`` adds one and fetches it, bare ``install``
fetches whatever is missing (in sorted-URI order), ``--frozen``
verifies the vendored files against ``jsonschema.lock.json`` (sha256)
without touching anything, ``--force`` refetches everything. Each
installed artifact is the BUNDLED schema (external refs + non-official
metaschemas embedded) reidentified with its source URI, so the
vendored file is self-contained. Events and errors match the
reference's output contract line for line — the install corpus replays
the reference's own .sh fixtures against this module via a CLI shim.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

EXIT_OK = 0
EXIT_FAIL = 2
EXIT_ARGS = 5
EXIT_INPUT = 6

_HELP_EXAMPLE = ("\n\nFor example: jsonschema install "
                 "https://example.com/schema ./vendor/schema.json")


class _Out:
    """Collects events; renders text lines eagerly or a JSON document
    at the end (--json)."""

    def __init__(self, json_mode: bool):
        self.json_mode = json_mode
        self.events: list[dict] = []

    def event(self, etype: str, label: str, value: str, **fields) -> None:
        self.events.append({"type": etype, **fields})
        if not self.json_mode:
            print(f"{label:<15}: {value}")

    def error_event(self, uri: str, message: str) -> None:
        self.events.append({"type": "error", "uri": uri,
                            "message": message})
        if not self.json_mode:
            print(f"error: {message}\n  at uri {uri}")

    def finish(self) -> None:
        if self.json_mode:
            from jsonschema_ray.spec.format import prettify_json

            print(prettify_json({"events": self.events}))


def _fail(json_mode: bool, message: str, *, extra_text: str = "",
          code: int = EXIT_INPUT, **fields) -> int:
    if json_mode:
        from jsonschema_ray.spec.format import prettify_json

        print(prettify_json({"error": message, **fields}))
    else:
        lines = [f"error: {message}"]
        for k, v in fields.items():
            label = {"filePath": "at file path", "uri": "at uri",
                     "line": "at line", "column": "at column"}.get(k)
            if label:
                lines.append(f"  {label} {v}")
            elif k == "location":
                lines.append(f'  at location "{v}"')
        print("\n".join(lines) + extra_text)
    return code


def _esc_ptr(s: str) -> str:
    return s.replace("~", "~0").replace("/", "~1")


def _sha256(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _find_config(cwd: str) -> str | None:
    cur = os.path.abspath(cwd)
    while True:
        cand = os.path.join(cur, "jsonschema.json")
        if os.path.isfile(cand):
            return cand
        parent = os.path.dirname(cur)
        if parent == cur:
            return None
        cur = parent


def _read_remote(uri: str, http: bool,
                 headers: list[str] | None = None):
    if uri.startswith("file://"):
        path = uri[len("file://"):]
        with open(path) as f:
            text = f.read()
        try:
            return json.loads(text)
        except json.JSONDecodeError:
            import yaml

            return yaml.safe_load(text)
    if http and uri.startswith(("http://", "https://")):
        from jsonschema_ray.sources.fetch import fetch_schema

        return fetch_schema(uri, headers=headers)
    raise FileNotFoundError(uri)


class _StopInstall(Exception):
    def __init__(self, code: int):
        super().__init__(code)
        self.code = code


_HEADER_EXAMPLE = ('\n\nFor example: --header "Authorization: Bearer '
                   '${TOKEN}"')


def check_http_headers(headers: list[str], json_mode: bool) -> int | None:
    """Validate --header values (reference validate_http_headers):
    `Name: Value` form, non-empty names, no whitespace/control chars."""
    for h in headers or []:
        if ":" not in h:
            return _fail(json_mode,
                         "HTTP headers must be in the form `Name: Value`",
                         extra_text=_HEADER_EXAMPLE, code=EXIT_ARGS)
        name, _, value = h.partition(":")
        if not name:
            return _fail(json_mode, "HTTP header names cannot be empty",
                         extra_text=_HEADER_EXAMPLE, code=EXIT_ARGS)
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in name):
            return _fail(json_mode,
                         "HTTP header names cannot contain control "
                         "characters", extra_text=_HEADER_EXAMPLE,
                         code=EXIT_ARGS)
        if any(c.isspace() for c in name):
            return _fail(json_mode,
                         "HTTP header names cannot contain whitespace",
                         extra_text=_HEADER_EXAMPLE, code=EXIT_ARGS)
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in value):
            return _fail(json_mode,
                         "HTTP header values cannot contain control "
                         "characters", extra_text=_HEADER_EXAMPLE,
                         code=EXIT_ARGS)
    return None


def run_install(cwd: str, positional: list[str], *, frozen: bool = False,
                force: bool = False, json_mode: bool = False,
                verbose: bool = False, http: bool = False,
                headers: list[str] | None = None,
                debug: bool = False) -> int:
    """The full project-mode install flow; returns the exit code."""
    bad = check_http_headers(headers or [], json_mode)
    if bad is not None:
        return bad
    if frozen and force:
        return _fail(json_mode,
                     "The --frozen and --force options cannot be used "
                     "together", code=EXIT_ARGS)
    if len(positional) not in (0, 2):
        return _fail(json_mode,
                     "The install command takes either zero or two "
                     "positional arguments",
                     extra_text=_HELP_EXAMPLE, code=EXIT_ARGS)

    cfg_path = _find_config(cwd)
    if cfg_path is None and positional:
        # adding a dependency bootstraps the project config
        cfg_path = os.path.join(os.path.abspath(cwd), "jsonschema.json")
        with open(cfg_path, "w") as f:
            f.write('{\n  "dependencies": {}\n}\n')
    if cfg_path is None:
        return _fail(
            json_mode, "Could not find a jsonschema.json configuration "
            "file",
            extra_text="\n\nLearn more here: https://github.com/"
                       "sourcemeta/jsonschema/blob/main/docs/"
                       "install.markdown",
            filePath=os.path.abspath(cwd))
    base = os.path.dirname(cfg_path)
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except json.JSONDecodeError as e:
        return _fail(json_mode, "Failed to parse the JSON document",
                     line=e.lineno, column=e.colno, filePath=cfg_path)
    if not isinstance(cfg, dict):
        return _fail(json_mode, "The configuration must be an object",
                     filePath=cfg_path, location="")
    deps = cfg.get("dependencies")
    if deps is None:
        deps = {}
    if not isinstance(deps, dict) or not all(
            isinstance(v, str) for v in deps.values()):
        return _fail(json_mode,
                     "The configuration dependencies must be an object "
                     "of URIs to paths", filePath=cfg_path,
                     location="/dependencies")

    resolve_map = {}
    for r_uri, r_path in (cfg.get("resolve") or {}).items():
        if isinstance(r_path, str):
            resolve_map[r_uri] = r_path if "://" in r_path \
                else "file://" + os.path.normpath(
                    os.path.join(base, r_path))

    adding = None
    if positional:
        uri, dest = positional
        if "://" not in uri and not uri.startswith(("file:", "urn:")):
            return _fail(json_mode, "The given URI is not valid",
                         extra_text=_HELP_EXAMPLE, code=EXIT_ARGS)
        if frozen:
            return _fail(json_mode,
                         "Do not use --frozen when adding a new "
                         "dependency", extra_text=_HELP_EXAMPLE,
                         code=EXIT_ARGS)
        # normalize the destination: config-dir-relative, "./"-
        # prefixed unless it escapes upward (pass_add_dependency_
        # absolute_path / _dot_dot_path fixtures)
        import posixpath

        dest_abs0 = os.path.normpath(
            dest if os.path.isabs(dest) else os.path.join(cwd, dest))
        rel = os.path.relpath(dest_abs0, base).replace(os.sep, "/")
        dest = rel if rel.startswith("../") else "./" + rel
        adding = (uri, dest)
        deps = dict(deps)
        deps[uri] = dest
        cfg["dependencies"] = dict(sorted(deps.items()))
        deps = cfg["dependencies"]

    # duplicate destination check (post-merge): flag the sorted-first
    # member of the first colliding path group
    by_path: dict[str, list[str]] = {}
    for u, p in deps.items():
        by_path.setdefault(os.path.normpath(p), []).append(u)
    for p, uris in by_path.items():
        if len(uris) > 1:
            return _fail(json_mode,
                         "Multiple dependencies cannot point to the "
                         "same path", filePath=cfg_path,
                         location=f"/dependencies/"
                                  f"{_esc_ptr(sorted(uris)[0])}")

    if not deps:
        if json_mode:
            from jsonschema_ray.spec.format import prettify_json

            print(prettify_json({"events": []}))
        else:
            print(f"No dependencies found\n  at {cfg_path}")
        return EXIT_OK

    out = _Out(json_mode)
    if adding is not None:
        from jsonschema_ray.spec.format import prettify_json

        out.event("adding", "Adding", f"{adding[0]} -> {adding[1]}",
                  uri=adding[0], path=adding[1])
        with open(cfg_path, "w") as f:
            f.write(prettify_json(cfg) + "\n")

    lock_path = os.path.join(base, "jsonschema.lock.json")
    lock: dict = {"version": 1, "dependencies": {}}
    if os.path.isfile(lock_path):
        try:
            with open(lock_path) as f:
                parsed = json.load(f)
        except json.JSONDecodeError as e:
            if frozen:
                return _fail(json_mode,
                             "Failed to parse the JSON document",
                             line=e.lineno, column=e.colno,
                             filePath=lock_path)
            parsed = None
        if parsed is not None and isinstance(parsed, dict) \
                and parsed.get("version") == 1 \
                and isinstance(parsed.get("dependencies"), dict):
            lock = parsed
        elif frozen:
            return _fail(json_mode, "Lock file is corrupted",
                         filePath=lock_path)
        else:
            out.events.append({"type": "warning",
                               "message": "Ignoring corrupted lock "
                                          "file"})
            if not json_mode:
                print("warning: Ignoring corrupted lock file\n"
                      f"  at {lock_path}")
    elif frozen:
        return _fail(json_mode, "Lock file not found", filePath=lock_path)
    ldeps: dict = lock["dependencies"]

    try:
        if frozen:
            code = _frozen_pass(deps, ldeps, base, out, verbose=verbose,
                                http=http, headers=headers,
                                resolve_map=resolve_map,
                                debug=debug)
        else:
            code = _install_pass(deps, ldeps, base, out, force=force,
                                 verbose=verbose, http=http,
                                 headers=headers,
                                 resolve_map=resolve_map, debug=debug)
            if code == EXIT_OK:
                from jsonschema_ray.spec.format import prettify_json

                lock["dependencies"] = dict(sorted(ldeps.items()))
                with open(lock_path, "w") as f:
                    f.write(prettify_json(lock) + "\n")
    except _StopInstall as stop:
        out.finish()
        return stop.code
    out.finish()
    return code


def _frozen_pass(deps: dict, ldeps: dict, base: str, out: _Out, *,
                 headers: list[str] | None = None,
                 verbose: bool, http: bool, resolve_map: dict,
                 debug: bool = False) -> int:
    problems = 0
    for uri in sorted(deps):
        path = deps[uri]
        entry = ldeps.get(uri)
        dest_abs = os.path.normpath(os.path.join(base, path))
        if entry is None:
            out.event("untracked", "Untracked", uri, uri=uri)
            problems += 1
            continue
        if os.path.normpath(entry.get("path", "")) \
                != os.path.normpath(path):
            out.event("path-mismatch", "Path mismatch", uri, uri=uri)
            out.error_event(
                uri, "Configured path does not match lock file in "
                     "frozen mode")
            raise _StopInstall(EXIT_FAIL)
        if not os.path.isfile(dest_abs):
            # missing vendored file: refetch, then verify the WRITTEN
            # bytes against the lock (no lock rewrite in frozen mode)
            digest = _install_one(uri, dest_abs, out, verbose=verbose,
                                  http=http, headers=headers,
                                  resolve_map=resolve_map,
                                  debug=debug)
            if digest != entry.get("hash"):
                out.error_event(
                    uri, "Written file hash does not match lock file")
                raise _StopInstall(EXIT_FAIL)
            continue
        if _sha256(dest_abs) != entry.get("hash"):
            out.event("mismatched", "Mismatched", dest_abs,
                      path=dest_abs)
            out.error_event(
                uri, "File hash does not match lock file in frozen mode")
            raise _StopInstall(EXIT_FAIL)
        out.event("up-to-date", "Up to date", uri, uri=uri)
    for uri in sorted(ldeps):
        if uri not in deps:
            out.event("orphaned", "Orphaned", uri, uri=uri)
            problems += 1
    return EXIT_FAIL if problems else EXIT_OK


def _install_pass(deps: dict, ldeps: dict, base: str, out: _Out, *,
                  headers: list[str] | None = None,
                  force: bool, verbose: bool, http: bool,
                  resolve_map: dict, debug: bool = False) -> int:
    for uri in sorted(deps):
        path = deps[uri]
        dest_abs = os.path.normpath(os.path.join(base, path))
        entry = ldeps.get(uri)
        if not force and entry is not None \
                and os.path.normpath(entry.get("path", "")) \
                == os.path.normpath(path) and os.path.isfile(dest_abs) \
                and _sha256(dest_abs) == entry.get("hash"):
            out.event("up-to-date", "Up to date", uri, uri=uri)
            continue
        digest = _install_one(uri, dest_abs, out, verbose=verbose,
                              http=http, headers=headers,
                              resolve_map=resolve_map,
                              debug=debug)
        ldeps[uri] = {"path": path, "hash": digest,
                      "hashAlgorithm": "sha256"}
    # drop lock entries for removed dependencies (reported as
    # orphans); their vendored files are deleted too
    for uri in sorted(u for u in ldeps if u not in deps):
        out.event("orphaned", "Orphaned", uri, uri=uri)
        stale = os.path.normpath(
            os.path.join(base, ldeps[uri].get("path", "")))
        if os.path.isfile(stale):
            os.remove(stale)
        del ldeps[uri]
    return EXIT_OK


def _install_one(uri: str, dest_abs: str, out: _Out, *,
                 verbose: bool, http: bool, resolve_map: dict,
                 headers: list[str] | None = None,
                 debug: bool = False, index: int = 1,
                 total: int = 1) -> str:
    """Fetch + bundle + write one dependency; returns the sha256 of
    the written file. Emits the installed event; raises _StopInstall
    (after an error event) on fetch/write failures."""
    from jsonschema_ray.spec.bundle import bundle_schema
    from jsonschema_ray.spec.format import prettify_json

    verbose = verbose or debug

    def dbg(msg: str) -> None:
        if debug and not out.json_mode:
            print(f"debug: {msg}")

    def stage(name: str) -> str:
        return f"{name}: {uri} ({index}/{total}) -> {dest_abs}"

    def _read(target_uri: str):
        target_uri = resolve_map.get(target_uri, target_uri)
        if target_uri.startswith("file://"):
            dbg("Attempting to read file reference from disk: "
                f"{target_uri[len('file://'):]}")
        # install is ALWAYS remote-enabled, independent of --http:
        # the reference's dependency_fetch passes remote=true
        # unconditionally (command_install.cc:42)
        return _read_remote(target_uri, True, headers)

    dbg(stage("fetch/start"))
    out.event("fetching", "Fetching", uri, uri=uri)
    try:
        remote = _read(uri)
    except Exception:  # noqa: BLE001 — unresolvable dependency
        out.error_event(uri, "Failed to fetch schema")
        raise _StopInstall(EXIT_INPUT) from None
    dbg(stage("fetch/end"))

    def resolver(target_uri: str):
        try:
            return _read(target_uri)
        except Exception:  # noqa: BLE001
            return None

    dbg(stage("bundle/start"))
    if verbose:
        out.event("bundling", "Bundling", uri, uri=uri)
    try:
        bundled = bundle_schema(remote, resolver, default_id=uri)
    except Exception as e:  # noqa: BLE001
        out.error_event(uri, str(e))
        raise _StopInstall(EXIT_INPUT) from None
    dbg(stage("bundle/end"))
    dbg(stage("write/start"))
    if verbose:
        out.event("writing", "Writing", dest_abs, path=dest_abs)
    parent = os.path.dirname(dest_abs)
    try:
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(dest_abs, "w") as f:
            f.write(prettify_json(bundled) + "\n")
    except (OSError, NotADirectoryError, FileExistsError):
        out.error_event(uri, "Failed to write schema")
        raise _StopInstall(EXIT_INPUT) from None
    dbg(stage("write/end"))
    dbg(stage("verify/start"))
    if verbose:
        out.event("verifying", "Verifying", dest_abs, path=dest_abs)
    digest = _sha256(dest_abs)
    dbg(stage("verify/end"))
    out.event("installed", "Installed", dest_abs, uri=uri, path=dest_abs)
    return digest
