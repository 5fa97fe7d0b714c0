"""Format-kernel parity vs Python's stdlib parsers (VERDICT round-1
item 10): date/time/ipv4/ipv6/uuid property-tested against
``datetime``/``ipaddress``/``uuid``, duration strictness, and real
punycode for the idn-* formats (stdlib IDNA codec, the public analog of
the reference's vendor/core/src/core/dns encoder)."""

import datetime
import ipaddress
import uuid as uuidlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_ray.functions.formats import check_format, check_format_value


def _ok(v: str, fmt: str) -> bool:
    # vectorized kernel and scalar checker must agree — assert both
    arr = pa.array([v], type=pa.string())
    k = bool(check_format(arr, fmt)[0])
    s = check_format_value(v, fmt)
    assert k == s, f"kernel/scalar divergence for {fmt}: {v!r}"
    return k


# ---------------------------------------------------------------------------
# duration strictness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v", ["P1Y", "P2W", "P1Y2M3D", "PT5M", "PT0.5S",
                               "P1DT12H", "P3Y6M4DT12H30M5S", "PT1H30M"])
def test_duration_valid(v):
    assert _ok(v, "duration")


@pytest.mark.parametrize("v", ["P", "PT", "P1YT", "P1W2D", "1Y", "P-1Y",
                               "PT1.5H", "P1.5Y", ""])
def test_duration_invalid(v):
    assert not _ok(v, "duration")


# ---------------------------------------------------------------------------
# IDN punycode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v", ["example.com", "bücher.example",
                               "xn--bcher-kva.example", "例.jp",
                               "sub.domain.example.org"])
def test_idn_hostname_valid(v):
    assert _ok(v, "idn-hostname")


@pytest.mark.parametrize("v", ["", "-bad.example", "a..b",
                               "a" * 64 + ".example", "un der.score",
                               "x" * 300 + ".example"])
def test_idn_hostname_invalid(v):
    assert not _ok(v, "idn-hostname")


def test_idn_email():
    assert _ok("user@bücher.example", "idn-email")
    assert _ok("uñer@example.com", "idn-email")
    assert not _ok("@example.com", "idn-email")
    assert not _ok("user@", "idn-email")
    assert not _ok("user@-bad-.example", "idn-email")
    assert not _ok("us er@example.com", "idn-email")


# ---------------------------------------------------------------------------
# property parity vs stdlib parsers
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.dates(min_value=datetime.date(1, 1, 1)))
def test_date_accepts_all_real_dates(d):
    assert _ok(d.isoformat(), "date")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789-", min_size=8, max_size=12))
def test_date_agrees_with_fromisoformat_on_rejects(s):
    """Anything our kernel accepts must parse with date.fromisoformat —
    including the Gregorian leap rule (the regex encodes it)."""
    if _ok(s, "date"):
        datetime.date.fromisoformat(s)  # must not raise


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 9999), st.integers(1, 12), st.integers(1, 31))
def test_date_full_calendar_parity(y, m, d):
    """Exact two-way parity with the stdlib calendar on all y-m-d."""
    s = f"{y:04d}-{m:02d}-{d:02d}"
    try:
        datetime.date.fromisoformat(s)
        valid = True
    except ValueError:
        valid = False
    assert _ok(s, "date") == valid, s


def test_leap_rule_and_datetime_separator():
    assert _ok("2024-02-29", "date")          # /4 leap
    assert _ok("2000-02-29", "date")          # /400 century leap
    assert not _ok("1900-02-29", "date")      # /100 century non-leap
    assert not _ok("2023-02-29", "date")
    assert _ok("2024-01-01T00:00:00Z", "date-time")
    assert _ok("2024-01-01t00:00:00z", "date-time")
    assert not _ok("2024-01-01 00:00:00Z", "date-time")  # RFC: T only


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_ipv4_parity(n):
    v = str(ipaddress.IPv4Address(n))
    assert _ok(v, "ipv4")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="0123456789.", max_size=18))
def test_ipv4_rejects_agree(s):
    if _ok(s, "ipv4"):
        ipaddress.IPv4Address(s)  # must not raise


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**128 - 1))
def test_ipv6_parity(n):
    v = str(ipaddress.IPv6Address(n))  # canonical :: compression
    assert _ok(v, "ipv6")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="0123456789abcdefABCDEF:.", max_size=40))
def test_ipv6_rejects_agree(s):
    if _ok(s, "ipv6"):
        ipaddress.IPv6Address(s)  # must not raise


@settings(max_examples=100, deadline=None)
@given(st.uuids())
def test_uuid_parity(u):
    assert _ok(str(u), "uuid")
    assert _ok(str(u).upper(), "uuid")
    assert not _ok(str(u).replace("-", ""), "uuid")  # canonical form only


@settings(max_examples=200, deadline=None)
@given(st.times())
def test_partial_time_accepts_all_real_times(t):
    v = t.replace(microsecond=0).isoformat()
    assert _ok(v, "partial-time")


def test_time_leap_second_and_offsets():
    assert _ok("23:59:60Z", "time")  # RFC 3339 permits leap seconds
    assert _ok("12:00:00+05:30", "time")
    assert not _ok("12:00:00", "time")       # full time needs an offset
    assert not _ok("24:00:00Z", "time")
