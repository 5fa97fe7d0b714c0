"""Vectorized "format" assertion kernels.

The reference implements 21 logical string formats as the
``AssertionStringType`` instruction (see
``/root/reference/vendor/blaze/src/evaluator/include/sourcemeta/blaze/evaluator_value.h:123-145``
and the dispatch at ``evaluator_dispatch.h:893-957``; the per-format
implementations live in ``/root/reference/vendor/core/src/core/{uri,email,ip,dns,time,css}``).

Here each format is a vectorized kernel over an Arrow string array:
regex-representable formats run through RE2
(``pyarrow.compute.match_substring_regex``); the rest fall back to a
batched Python kernel (still one call per batch, never one per row in
the pipeline hot path — the kernel itself loops only where the check is
inherently per-value, e.g. compiling a candidate regex).

Null handling: a null value never *matches* a format; format rules are
normally guarded by a ``not_null`` condition upstream.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Regex-representable formats (anchored; evaluated by RE2 — no lookaround).
# ---------------------------------------------------------------------------

_DATE = r"\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
_PARTIAL_TIME = r"([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?"
_TIME = _PARTIAL_TIME + r"(Z|z|[+-]([01]\d|2[0-3]):[0-5]\d)"
_IPV4_OCTET = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_IPV4 = rf"{_IPV4_OCTET}(\.{_IPV4_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
# RFC 4291 ipv6 (with :: compression and embedded ipv4 tail)
_IPV6 = (
    rf"(({_H16}:){{7}}{_H16}"
    rf"|({_H16}:){{1,7}}:"
    rf"|({_H16}:){{1,6}}:{_H16}"
    rf"|({_H16}:){{1,5}}(:{_H16}){{1,2}}"
    rf"|({_H16}:){{1,4}}(:{_H16}){{1,3}}"
    rf"|({_H16}:){{1,3}}(:{_H16}){{1,4}}"
    rf"|({_H16}:){{1,2}}(:{_H16}){{1,5}}"
    rf"|{_H16}:(:{_H16}){{1,6}}"
    rf"|:((:{_H16}){{1,7}}|:)"
    rf"|({_H16}:){{1,4}}:{_IPV4}"
    rf"|::([Ff]{{4}}:)?{_IPV4})"
)
_HOSTNAME_LABEL = r"[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
_HOSTNAME = rf"{_HOSTNAME_LABEL}(\.{_HOSTNAME_LABEL})*\.?"
# pragmatic email (reference uses a full RFC5321 parser; this is the
# common draft-test-suite-compatible subset)
_EMAIL = r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@" + _HOSTNAME
_UUID = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
_DURATION = (
    r"P(\d+W|(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?)"
)
_SCHEME = r"[A-Za-z][A-Za-z0-9+.-]*"
_URI_CHARS = r"[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]"
_URI = rf"{_SCHEME}:{_URI_CHARS}*"
_URI_REFERENCE = rf"({_SCHEME}:)?{_URI_CHARS}*"
_URI_TEMPLATE = r"[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%{}]*"
_JSON_POINTER = r"(/([^/~]|~[01])*)*"
_REL_JSON_POINTER = r"(0|[1-9]\d*)(#|" + _JSON_POINTER + r")"
_COLOR_HEX = r"#([0-9a-fA-F]{3}|[0-9a-fA-F]{6}|[0-9a-fA-F]{8})"

#: north-rule media reference format: ``media://<hex16>``
_MEDIA_REF = r"media://[0-9a-f]{16}"

REGEX_FORMATS: dict[str, str] = {
    "date": _DATE,
    "time": _TIME,
    "partial-time": _PARTIAL_TIME,
    "date-time": rf"{_DATE}[Tt ]{_TIME}",
    "ipv4": _IPV4,
    "ipv6": _IPV6,
    "hostname": _HOSTNAME,
    "idn-hostname": _HOSTNAME,  # ASCII subset; IDN/punycode pedantics stubbed
    "email": _EMAIL,
    "idn-email": _EMAIL,  # ASCII subset
    "uuid": _UUID,
    "duration": _DURATION,
    "uri": _URI,
    "uri-reference": _URI_REFERENCE,
    "iri": _URI,  # ASCII superset handled identically
    "iri-reference": _URI_REFERENCE,
    "uri-template": _URI_TEMPLATE,
    "json-pointer": _JSON_POINTER,
    "relative-json-pointer": _REL_JSON_POINTER,
    "color": _COLOR_HEX,
    "media-ref": _MEDIA_REF,
}


def _regex_kernel(pattern: str) -> Callable[[pa.Array], np.ndarray]:
    anchored = rf"^({pattern})$"

    def kernel(arr: pa.Array) -> np.ndarray:
        mask = pc.match_substring_regex(arr, anchored)
        return mask.fill_null(False).to_numpy(zero_copy_only=False)

    return kernel


def _regex_format_kernel(arr: pa.Array) -> np.ndarray:
    """format: "regex" — value must itself be a compilable regex.

    The reference delegates to PCRE2 compile (``vendor/core/src/core/regex``);
    here we attempt a Python ``re.compile`` per *unique* value with a cache.
    """
    uniq = pc.unique(arr.drop_null())
    ok: dict[str, bool] = {}
    for v in uniq.to_pylist():
        try:
            re.compile(v)
            ok[v] = True
        except re.error:
            ok[v] = False
    out = np.zeros(len(arr), dtype=bool)
    vals = arr.to_numpy(zero_copy_only=False)
    for i, v in enumerate(vals):
        if v is not None:
            out[i] = ok.get(v, False)
    return out


_KERNELS: dict[str, Callable[[pa.Array], np.ndarray]] = {
    name: _regex_kernel(pat) for name, pat in REGEX_FORMATS.items()
}
_KERNELS["regex"] = _regex_format_kernel


def format_names() -> list[str]:
    return sorted(_KERNELS)


def check_format(arr: pa.Array | pa.ChunkedArray, fmt: str) -> np.ndarray:
    """Boolean mask: value conforms to ``fmt``. Nulls → False."""
    if fmt not in _KERNELS:
        raise ValueError(f"unknown format: {fmt!r} (have {format_names()})")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return _KERNELS[fmt](arr)
