"""``jsonschema.json`` project configuration — discovery + application.

The reference discovers a ``jsonschema.json`` config by ancestor walk
from the input path (NPM-style; ``docs/configuration.markdown`` "Lookup
Algorithm", ``src/configure.h find_configuration``) and uses it for
``defaultDialect``, ``resolve`` URI remapping, ``extension`` /
``ignore`` traversal defaults, and lint rule config.

Here: ``find_configuration`` walks ancestors; ``load_configuration``
normalizes relative paths against the config's directory;
``apply_to_schema`` stamps ``$schema`` from ``defaultDialect`` when the
document has none and mounts every ``resolve`` target file into
``$defs`` carrying its ``$id`` (the evaluator's embedded-resource
registry then resolves absolute-URI ``$ref``s to them — the sandboxed,
no-network analog of the reference's resolver remapping).
"""

from __future__ import annotations

import json
import os
from typing import Any

CONFIG_NAME = "jsonschema.json"


def find_configuration(start: str) -> str | None:
    """Ancestor lookup from the directory of ``start`` (file or dir)."""
    cur = os.path.abspath(start)
    if not os.path.isdir(cur):
        cur = os.path.dirname(cur)
    while True:
        cand = os.path.join(cur, CONFIG_NAME)
        if os.path.isfile(cand):
            return cand
        parent = os.path.dirname(cur)
        if parent == cur:
            return None
        cur = parent


def _cfg_error(cfg_path: str, text: str, message: str, loc: str):
    from jsonschema_ray.spec.clierrors import EXIT_OTHER_INPUT, CLIError

    line = column = None
    try:
        from jsonschema_ray.spec.positions import pointer_positions

        span = pointer_positions(text).get(loc)
        if span:
            line, column = span[0], span[1]
    except Exception:   # noqa: BLE001 — position is best-effort
        pass
    err = CLIError(message, line=line, column=column,
                   filePath=os.path.realpath(cfg_path), location=loc)
    err.exit_code = EXIT_OTHER_INPUT
    return err


def load_configuration(cfg_path: str) -> dict:
    """Parse + normalize: ``resolve`` values and ``ignore`` entries
    become absolute paths (relative to the config's directory);
    ``extension`` is always a list. Shape violations reject with the
    reference's typed configuration errors (exit 6)."""
    with open(cfg_path) as f:
        text = f.read()
    cfg = json.loads(text)
    if isinstance(cfg, dict):
        dd = cfg.get("defaultDialect")
        if dd is not None and not isinstance(dd, str):
            raise _cfg_error(cfg_path, text, "The defaultDialect "
                             "property must be a string",
                             "/defaultDialect")
        res = cfg.get("resolve")
        if res is not None and not isinstance(res, dict):
            raise _cfg_error(cfg_path, text, "The resolve property "
                             "must be an object", "/resolve")
        pth = cfg.get("path")
        if pth is not None and not isinstance(pth, str):
            raise _cfg_error(cfg_path, text, "The path property must "
                             "be a string", "/path")
    base = os.path.dirname(os.path.abspath(cfg_path))
    out = dict(cfg)
    out["_dir"] = base
    res = {}
    for uri, target in (cfg.get("resolve") or {}).items():
        res[uri] = target if "://" in str(target) \
            else os.path.normpath(os.path.join(base, target))
    out["resolve"] = res
    out["ignore"] = [os.path.normpath(os.path.join(base, p))
                     for p in (cfg.get("ignore") or [])]
    ext = cfg.get("extension")
    if isinstance(ext, str):
        ext = [ext]
    out["extension"] = ext or []
    return out


def discover(start: str) -> dict | None:
    p = find_configuration(start)
    return load_configuration(p) if p else None


def apply_to_schema(schema: Any, cfg: dict | None,
                    path: str | None = None, *,
                    mount_resolves: bool = True) -> Any:
    """Return the schema with the config applied: ``$schema`` defaulted
    from ``defaultDialect`` (only for files matching the configured
    ``extension`` list when ``path`` is given — the configuration
    "applies_to" gate, blaze configuration.cc:69-84), and each
    ``resolve`` mapping whose target is a local file mounted under
    ``$defs`` with its URI as ``$id`` (so absolute-URI ``$ref``s
    resolve through the embedded-resource registry)."""
    if not cfg or not isinstance(schema, dict):
        return schema
    out = dict(schema)
    dd = cfg.get("defaultDialect")
    if dd and path is not None:
        exts = cfg.get("extension")
        if isinstance(exts, str):
            exts = [exts]
        if exts:
            norm = [e if (not e or str(e).startswith(".")) else "." + str(e)
                    for e in exts]
            name = os.path.basename(path)
            if not any((not e and "." not in name)
                       or (e and name.endswith(e)) for e in norm):
                dd = None
    if dd and "$schema" not in out:
        out["$schema"] = dd
    mounts = {}
    for uri, target in ((cfg.get("resolve") or {}).items()
                        if mount_resolves else ()):
        if "://" in str(target):   # URI→URI remap: no file to mount
            continue
        if not os.path.isfile(target):
            continue
        with open(target) as f:
            doc = json.load(f)
        if isinstance(doc, dict):
            doc = {**doc, "$id": uri}  # the URI IS the resource identity
        mounts[f"__resolve_{len(mounts)}"] = doc
    if mounts:
        defs = dict(out.get("$defs", {}))
        defs.update(mounts)
        out["$defs"] = defs
    return out
