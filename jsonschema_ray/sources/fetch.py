"""HTTP schema fetching + the ``install`` verb's local store / lock.

The reference's ``jsonschema install``
(``/root/reference/src/command_install.cc:273-465``) fetches remote
schema dependencies into a vendored directory and records a
``jsonschema.lock.json`` so later resolution works offline; its
resolver (``src/resolver.h:262+``) falls back to HTTP for unknown
``$id`` URIs.  The analog here:

- :func:`fetch_schema` — fetch and parse one schema document over
  ``http(s)://`` or ``file://`` (JSON first, YAML fallback, mirroring
  the reference's ``read_file`` JSON-then-YAML probing).  Network use
  is always EXPLICIT: nothing in the validation pipelines calls this
  implicitly; tests exercise it against a localhost server.
- :class:`SchemaStore` — a directory of installed schemas plus a
  ``schemas.lock.json`` mapping URI → {path, sha256}.  ``install()``
  writes atomically (write-then-rename, like the reference's
  ``atomic_write_json``); ``resolve()`` serves from the store with no
  network; ``frozen=True`` install verifies the lock instead of
  refreshing it (the reference's ``--frozen``).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Any


def _parse_doc(text: str) -> Any:
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        import yaml

        return yaml.safe_load(text)


class FetchStatusError(Exception):
    """Non-200 HTTP response (the reference's HTTPStatusError,
    resolver.h http_fetch)."""

    def __init__(self, uri: str, status: int):
        super().__init__(f"GET {uri} -> HTTP {status}")
        self.uri = uri
        self.status = status


def parse_http_headers(headers) -> list[tuple[str, str]]:
    """``["Name: Value", ...]`` → [(name, value)] (resolver.h
    parse_http_header)."""
    out = []
    for h in headers or []:
        name, _, value = str(h).partition(":")
        out.append((name.strip(), value.strip()))
    return out


def fetch_schema(uri: str, *, timeout: float = 10.0,
                 headers: list[str] | None = None) -> Any:
    """Fetch one schema document by URI (http/https/file).

    ``headers``: raw ``--header`` values ("Name: Value"), sent with
    every HTTP request like the reference's collect_http_headers
    (``/root/reference/src/resolver.h:120-140``). YAML is parsed when
    the response content-type says yaml or the path ends .yaml/.yml
    (resolver.h http_fetch content-type dispatch); otherwise strict
    JSON, so parse failures surface line/column like the reference.
    A non-200 status raises :class:`FetchStatusError`."""
    from urllib.error import HTTPError
    from urllib.parse import urlparse
    from urllib.request import Request, urlopen

    parsed = urlparse(uri)
    if parsed.scheme not in ("http", "https", "file"):
        raise ValueError(f"unsupported URI scheme in {uri!r} "
                         "(http, https, file)")
    req = Request(uri, headers=dict(parse_http_headers(headers)))
    try:
        with urlopen(req, timeout=timeout) as resp:  # noqa: S310 — explicit
            raw = resp.read()
            ctype = str(resp.headers.get("content-type") or "") \
                if getattr(resp, "headers", None) is not None else ""
    except HTTPError as exc:
        raise FetchStatusError(uri, exc.code) from None
    text = raw.decode("utf-8")
    if "yaml" in ctype.lower() or parsed.path.endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text)
    if parsed.scheme == "file":
        return _parse_doc(text)  # files keep JSON-then-YAML probing
    return json.loads(text)


def _safe_name(uri: str) -> str:
    """Deterministic filesystem name for a URI."""
    slug = re.sub(r"[^A-Za-z0-9._-]+", "_", uri.split("://", 1)[-1]).strip("_")
    digest = hashlib.sha256(uri.encode()).hexdigest()[:12]
    return f"{slug[:80]}-{digest}.json"


class SchemaStore:
    """Local directory of installed schemas + lock file."""

    LOCK = "schemas.lock.json"

    def __init__(self, root: str):
        self.root = root
        self._lock_path = os.path.join(root, self.LOCK)
        self._lock: dict[str, dict[str, str]] = {}
        if os.path.exists(self._lock_path):
            try:
                with open(self._lock_path) as f:
                    self._lock = json.load(f)
            except (json.JSONDecodeError, OSError):
                # corrupted lock is ignored with a fresh start, like the
                # reference's "Ignoring corrupted lock file" warning path
                self._lock = {}

    # -- install ----------------------------------------------------------
    def install(self, uri: str, *, timeout: float = 10.0,
                force: bool = False, frozen: bool = False) -> dict[str, str]:
        """Fetch ``uri`` into the store; returns its lock entry.

        ``force=False`` skips URIs already present with an intact file
        (FetchMode::Missing); ``frozen=True`` never touches the lock —
        it verifies the stored bytes still match it and raises on drift
        (LockNotFoundError / hash mismatch analogs).
        """
        entry = self._lock.get(uri)
        if frozen:
            if entry is None:
                raise FileNotFoundError(
                    f"frozen install: {uri!r} not in {self._lock_path}")
            path = os.path.join(self.root, entry["path"])
            digest = self._sha256(path)
            if digest != entry["sha256"]:
                raise ValueError(
                    f"frozen install: {uri!r} content hash drifted "
                    f"({digest[:12]} != {entry['sha256'][:12]})")
            return entry
        if entry is not None and not force:
            path = os.path.join(self.root, entry["path"])
            if os.path.exists(path) \
                    and self._sha256(path) == entry["sha256"]:
                return entry
        doc = fetch_schema(uri, timeout=timeout)
        name = _safe_name(uri)
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, name)
        self._atomic_write(path, json.dumps(doc, indent=2, sort_keys=True))
        entry = {"path": name, "sha256": self._sha256(path)}
        self._lock[uri] = entry
        self._atomic_write(self._lock_path,
                           json.dumps(self._lock, indent=2, sort_keys=True))
        return entry

    # -- resolve (offline) -------------------------------------------------
    def resolve(self, uri: str) -> Any | None:
        """Return the installed document for ``uri``, or None."""
        entry = self._lock.get(uri)
        if entry is None:
            return None
        path = os.path.join(self.root, entry["path"])
        with open(path) as f:
            return json.load(f)

    def uris(self) -> list[str]:
        return sorted(self._lock)

    @staticmethod
    def _sha256(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    @staticmethod
    def _atomic_write(path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
