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

# calendar-aware month/day combos, INCLUDING the Gregorian leap rule:
# Feb 29 only in years divisible by 4, except centuries not divisible
# by 400 — expressible as a pure (RE2-safe, lookaround-free) regex, so
# the vectorized kernel is a full RFC 3339 full-date parser
_LEAP_YEAR = (r"(\d{2}(0[48]|[2468][048]|[13579][26])"
              r"|([02468][048]|[13579][26])00)")
_DATE = (r"(\d{4}-"
         r"(((0[13578]|1[02])-(0[1-9]|[12]\d|3[01]))"
         r"|((0[469]|11)-(0[1-9]|[12]\d|30))"
         r"|(02-(0[1-9]|1\d|2[0-8])))"
         rf"|{_LEAP_YEAR}-02-29)")
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
# RFC 3339 appendix-A duration WITHOUT the degenerate forms the round-1
# regex accepted ("P", "PT", "P1YT"): every alternative requires ≥1
# component and a "T" requires ≥1 time component (RE2-safe: alternation
# instead of lookahead; mirrors the reference's parser in
# vendor/core/src/core/time)
_DUR_TIME = (r"T(\d+H(\d+M)?(\d+(\.\d+)?S)?"
             r"|\d+M(\d+(\.\d+)?S)?"
             r"|\d+(\.\d+)?S)")
_DUR_DATE = rf"(\d+Y(\d+M)?(\d+D)?|\d+M(\d+D)?|\d+D)({_DUR_TIME})?"
_DURATION = rf"P(\d+W|{_DUR_TIME}|{_DUR_DATE})"
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
    # RFC 3339 grammar: 'T'/'t' only (the space variant is a
    # by-mutual-agreement NOTE, rejected by the official test suite)
    "date-time": rf"{_DATE}[Tt]{_TIME}",
    "ipv4": _IPV4,
    "ipv6": _IPV6,
    "hostname": _HOSTNAME,
    "email": _EMAIL,
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


# ---------------------------------------------------------------------------
# IDN formats: real punycode via the stdlib IDNA codec (RFC 3490 ToASCII,
# the public analog of the reference's vendor/core/src/core/dns encoder).
# Non-regex by nature → batched Python kernels with a per-unique cache.
# ---------------------------------------------------------------------------

_HOSTNAME_RX = re.compile(rf"^({_HOSTNAME})$")
_IDN_LOCAL_RX = re.compile(r"^[^\s@]+$")


def idn_hostname_ok(v: str) -> bool:
    """Unicode hostname validity: every label survives IDNA ToASCII
    (punycode) and the encoded form is a valid LDH hostname. Rejects
    bad punycode (`xn--` labels that don't decode), overlong labels,
    and empty labels — the failure modes the round-1 ASCII stub let
    through."""
    if not v or len(v) > 510:
        return False
    try:
        enc = v.rstrip(".").encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return False
    if len(enc) > 253:
        return False
    return _HOSTNAME_RX.match(enc) is not None


def idn_email_ok(v: str) -> bool:
    """SMTPUTF8-flavoured email: non-empty local part without
    whitespace/@, domain a valid IDN hostname."""
    local, sep, domain = v.rpartition("@")
    if not sep or not local:
        return False
    return _IDN_LOCAL_RX.match(local) is not None and idn_hostname_ok(domain)


PYTHON_FORMATS: dict[str, Callable[[str], bool]] = {
    "idn-hostname": idn_hostname_ok,
    "idn-email": idn_email_ok,
}


def _python_kernel(fn: Callable[[str], bool]) -> Callable[[pa.Array], np.ndarray]:
    def kernel(arr: pa.Array) -> np.ndarray:
        uniq = pc.unique(arr.drop_null())
        ok = {v: fn(v) for v in uniq.to_pylist()}
        vals = arr.to_numpy(zero_copy_only=False)
        out = np.zeros(len(arr), dtype=bool)
        for i, v in enumerate(vals):
            if v is not None:
                out[i] = ok.get(v, False)
        return out
    return kernel


def check_format_value(v: str, fmt: str) -> bool:
    """Scalar format check — the single source of truth shared by the
    pure-Python predicate evaluator and the JSON Schema evaluator."""
    if fmt in PYTHON_FORMATS:
        return PYTHON_FORMATS[fmt](v)
    if fmt == "regex":
        try:
            re.compile(v)
            return True
        except re.error:
            return False
    return re.fullmatch(REGEX_FORMATS[fmt], v) is not None


_KERNELS: dict[str, Callable[[pa.Array], np.ndarray]] = {
    name: _regex_kernel(pat) for name, pat in REGEX_FORMATS.items()
}
_KERNELS["regex"] = _regex_format_kernel
for _name, _fn in PYTHON_FORMATS.items():
    _KERNELS[_name] = _python_kernel(_fn)


def format_names() -> list[str]:
    return sorted(_KERNELS)


def check_format(arr: pa.Array | pa.ChunkedArray, fmt: str) -> np.ndarray:
    """Boolean mask: value conforms to ``fmt``. Nulls → False."""
    if fmt not in _KERNELS:
        raise ValueError(f"unknown format: {fmt!r} (have {format_names()})")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return _KERNELS[fmt](arr)
