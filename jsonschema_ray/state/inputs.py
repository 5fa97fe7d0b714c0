"""Reference-parity input iteration for driver-side verbs.

Mirrors ``/root/reference/src/input.h`` (``for_each_json``,
``handle_json_entry``, ``parse_extensions``, ``parse_ignore``): explicit
files/dirs or a cwd/config-path walk, extension + ignore filters with
the exact warning/verbose lines, deterministic per-argument sorted
order, stdin via ``-``, JSON-then-YAML content detection. Used by the
schema-document verbs (fmt/lint/...); bulk data flows through Ray Data
sources instead (``sources/readers.py``).
"""

from __future__ import annotations

import json
import os
import sys
from dataclasses import dataclass, field
from typing import Any

from jsonschema_ray.spec.clierrors import (CLIArgumentError,
                                           JSONParseError,
                                           NoSuchFileError)


@dataclass
class InputEntry:
    path: str                   # canonical display path
    doc: Any = None
    text: str = ""
    yaml: bool = False
    from_stdin: bool = False
    config: dict | None = None  # discovered jsonschema.json (parsed)
    config_path: str | None = None
    error: Exception | None = None   # deferred parse error

    def parsed(self) -> Any:
        if self.error is not None:
            raise self.error
        return self.doc


STDIN_PATH = "/dev/stdin"


def _map_yaml_error(e, path: str):
    """YAML parse failures in the reference's wording: a second
    document in a single-document context is 'Unexpected content
    after document' with the mark position (core yaml parser)."""
    from jsonschema_ray.spec.clierrors import CLIError, EXIT_OTHER_INPUT

    mark = getattr(e, "problem_mark", None) \
        or getattr(e, "context_mark", None)
    if mark is not None and "document" in str(e):
        # PyYAML marks the `---` separator; the reference reports the
        # second document's CONTENT line
        line, col = mark.line + 1, mark.column + 1
        try:
            if mark.buffer.split("\n")[mark.line].strip() == "---":
                line, col = line + 1, 1
        except Exception:   # noqa: BLE001 — position is best-effort
            pass
        err = CLIError("Unexpected content after document",
                       line=line, column=col, filePath=path)
        err.exit_code = EXIT_OTHER_INPUT
        return err
    return e


def _parse_text(text: str, path: str, ext: str):
    """(doc, yaml_flag) — JSON first; YAML fallback for non-.json
    extensions (the reference's content detection)."""
    try:
        return json.loads(text), False
    except json.JSONDecodeError as e:
        if ext != ".json":
            try:
                import yaml

                doc = yaml.safe_load(text)
                if doc is not None or text.strip() in ("null", "~"):
                    return doc, True
            except Exception:
                pass
        raise JSONParseError(e.lineno, e.colno, filePath=path) from e


def _read_entry(path: str) -> InputEntry:
    ext = os.path.splitext(path)[1]
    with open(path, encoding="utf-8") as f:
        text = f.read()
    entry = InputEntry(path=path, text=text)
    if ext in (".yaml", ".yml"):
        entry.yaml = True
        try:
            import yaml

            entry.doc = yaml.safe_load(text)
        except Exception as e:   # noqa: BLE001 — deferred to the verb
            entry.error = _map_yaml_error(e, path)
        return entry
    try:
        entry.doc, entry.yaml = _parse_text(text, path, ext)
    except JSONParseError as e:
        entry.error = e
    return entry


def read_stdin_entry() -> InputEntry:
    text = sys.stdin.read()
    entry = InputEntry(path=STDIN_PATH, text=text, from_stdin=True)
    try:
        entry.doc, entry.yaml = _parse_text(text, STDIN_PATH, "")
    except JSONParseError as e:
        entry.error = e
    return entry


def _normalize_ext(e: str) -> str:
    return e if (not e or e.startswith(".")) else "." + e


def resolve_extensions(flag_exts, config: dict | None, *, verbose: bool,
                       log) -> list[str]:
    """--extension flags + config ``extension`` merged; defaults
    .json/.yaml/.yml; verbose "Using extension:" lines
    (input.h:48-107)."""
    result: list[str] = []
    for e in (flag_exts or []):
        e = _normalize_ext(e)
        if e not in result:
            result.append(e)
    cfg_ext = (config or {}).get("extension")
    if isinstance(cfg_ext, str):
        cfg_ext = [cfg_ext]
    if config is not None and not cfg_ext:
        # a Configuration carries default extensions (blaze
        # configuration.h:62), so they surface in verbose output
        cfg_ext = [".json", ".yml", ".yaml"]
    for e in (cfg_ext or []):
        e = _normalize_ext(str(e))
        if e not in result:
            result.append(e)
    for e in sorted(result):
        if not e:
            print("warning: Matching files with no extension", file=log)
        elif verbose:
            print(f"Using extension: {e}", file=log)
    return sorted(result) or [".json", ".yaml", ".yml"]


@dataclass
class WalkOptions:
    extensions: list[str] | None = None       # --extension values
    ignores: list[str] | None = None          # --ignore values
    verbose: bool = False
    debug: bool = False
    log: Any = None                           # stream for warnings


def walk_inputs(paths: list[str], opts: WalkOptions | None = None
                ) -> list[InputEntry]:
    """The ``for_each_json`` contract. ``paths`` empty → config-path or
    cwd recursive walk with the reference's warning lines."""
    from jsonschema_ray.state.config import find_configuration, \
        load_configuration

    opts = opts or WalkOptions()
    if opts.debug:
        # LOG_VERBOSE fires under --debug too (src/logger.h)
        opts.verbose = True
    log = opts.log or sys.stderr
    if sum(1 for p in paths if p == "-") > 1:
        raise CLIArgumentError(
            "Cannot read from standard input more than once")

    blacklist = [os.path.realpath(i) for i in (opts.ignores or [])]
    for i in sorted(blacklist):
        if opts.verbose:
            print(f'Ignoring path: "{i}"', file=log)

    def merge_config_ignore(cfg: dict | None, cfg_path: str | None):
        for ig in (cfg or {}).get("ignore") or []:
            base = os.path.dirname(cfg_path) if cfg_path else "."
            full = os.path.realpath(os.path.join(base, str(ig)))
            if opts.verbose:
                print(f'Ignoring path from configuration: "{full}"',
                      file=log)
            blacklist.append(full)

    def discover(start: str):
        p = find_configuration(start)
        if p is None:
            return None, None
        if opts.debug:
            print(f"debug: Using configuration file: "
                  f"{os.path.realpath(p)}", file=log)
        return load_configuration(p), p

    def under_blacklist(path: str) -> bool:
        rp = os.path.realpath(path)
        return any(rp == b or rp.startswith(b.rstrip("/") + "/")
                   for b in blacklist)

    def scan_dir(d: str, extensions: list[str]) -> list[InputEntry]:
        out = []
        for root, _dirs, names in os.walk(d):
            for n in names:
                full = os.path.realpath(os.path.join(root, n))
                ok = any((not e and "." not in n) or
                         (e and full.endswith(e)) for e in extensions)
                if not ok or under_blacklist(full):
                    continue
                if os.path.getsize(full) == 0:
                    continue
                out.append(_read_entry(full))
        return sorted(out, key=lambda x: x.path)

    result: list[InputEntry] = []
    if not paths:
        cwd = os.getcwd()
        cfg, cfg_path = discover(cwd)
        scan = cwd
        explicit = False
        if cfg and cfg.get("path"):
            scan = os.path.realpath(
                os.path.join(os.path.dirname(cfg_path), cfg["path"]))
            explicit = True
        elif cfg_path:
            scan = os.path.realpath(os.path.dirname(cfg_path))
        if cfg_path is None:
            print(f"warning: Recursively processing every file in "
                  f"{os.path.realpath(cwd)} as no input was provided",
                  file=log)
        elif not explicit:
            print(f"warning: Recursively processing every file in "
                  f"{scan} as the configuration file does not set an "
                  f"explicit path", file=log)
        merge_config_ignore(cfg, cfg_path)
        extensions = resolve_extensions(opts.extensions, cfg,
                                        verbose=opts.verbose, log=log)
        if not os.path.isdir(scan):
            # a configured path that does not exist (extension lines
            # print first — fail_config_path_enoent.sh)
            raise NoSuchFileError(os.path.realpath(scan))
        entries = scan_dir(scan, extensions)
        for e in entries:
            e.config, e.config_path = cfg, cfg_path
        return entries

    # explicit arguments: first merge every distinct config's ignores
    seen_cfgs = set()
    configs: dict[str, tuple[dict | None, str | None]] = {}
    for p in paths:
        if p == "-":
            continue
        rp = os.path.realpath(p)
        start = rp if os.path.isdir(rp) else os.path.dirname(rp)
        cfg, cfg_path = discover(start)
        configs[p] = (cfg, cfg_path)
        if cfg_path and cfg_path not in seen_cfgs:
            seen_cfgs.add(cfg_path)
            merge_config_ignore(cfg, cfg_path)

    for p in paths:
        if p == "-":
            result.append(read_stdin_entry())
            continue
        cfg, cfg_path = configs[p]
        extensions = resolve_extensions(opts.extensions, cfg,
                                        verbose=opts.verbose, log=log)
        rp = os.path.realpath(p)
        if os.path.isdir(rp):
            batch = scan_dir(rp, extensions)
        elif os.path.isfile(rp):
            if under_blacklist(rp):
                batch = []
            else:
                batch = [_read_entry(rp)]
        else:
            raise NoSuchFileError(rp)
        for e in batch:
            e.config, e.config_path = cfg, cfg_path
        result.extend(batch)
    return result
