"""Remaining FIXTURES.md F5 edge fixtures: unicode length semantics,
int32 boundary offsets, max-size span lists, all-violating docs."""

import numpy as np
import pyarrow as pa

from jsonschema_ray.pipelines.validate import validate
from jsonschema_ray.sources.readers import DatasetSource
from jsonschema_ray.sources.synth import SPAN_SCHEMA
from jsonschema_ray.spec.plan import CheckPlan, Rule, default_plan
from tests.oracle import oracle_violations


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_SCHEMA)),
    })


def _span(kind="text", text="x", ref=None, off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_unicode_length_semantics(ray_session):
    """utf8_len counts code points (the reference's core/unicode
    semantics), not bytes: 'ééé' is 3, not 6."""
    import ray.data as rd

    plan = CheckPlan(rules=[
        Rule("maxlen3", scope="span",
             when={"op": "eq", "field": "kind", "value": "text"},
             check={"op": "utf8_len", "field": "text", "max": 3},
             message="too long")])
    table = _docs([
        ("cp", [_span(text="ééé")]),          # 3 code points → passes
        ("bytes", [_span(text="ééééé")]),     # 5 code points → violates
        ("emoji", [_span(text="👍👍")]),       # 2 code points → passes
    ])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    t = res.table()
    assert t.column("doc_id").to_pylist() == ["bytes"]
    # engine agrees with the python-len oracle on unicode
    got = set(zip(t.column("doc_id").to_pylist(),
                  t.column("rule_id").to_pylist(),
                  t.column("span_index").to_pylist()))
    assert got == oracle_violations(table.to_pylist(), plan)


def test_int32_boundary_offsets(ray_session):
    import ray.data as rd

    imax = 2**31 - 1
    table = _docs([
        ("max", [_span(off=0), _span(off=imax)]),          # valid, increasing
        ("maxdup", [_span(off=imax), _span(off=imax)]),    # not increasing
    ])
    plan = default_plan().filtered(
        only=["offset_nonnegative", "offset_monotonic"])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    got = set(zip(res.table().column("doc_id").to_pylist(),
                  res.table().column("rule_id").to_pylist(),
                  res.table().column("span_index").to_pylist()))
    assert got == {("maxdup", "offset_monotonic", 1)}
    assert got == oracle_violations(table.to_pylist(), plan)


def test_huge_span_list(ray_session):
    """A 20k-span doc flows through flatten/monotonic without batch
    splitting issues; violations land at exact indices."""
    import ray.data as rd

    n = 20_000
    spans = [_span(text=f"t{i}", off=i) for i in range(n)]
    spans[12345]["offset"] = 0  # break monotonicity at exactly one index
    table = _docs([("big", spans)])
    plan = default_plan().filtered(only=["offset_monotonic"])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    keys = sorted(zip(res.table().column("doc_id").to_pylist(),
                      res.table().column("rule_id").to_pylist(),
                      res.table().column("span_index").to_pylist()))
    assert keys == [("big", "offset_monotonic", 12345)]
    assert set(keys) == oracle_violations(table.to_pylist(), plan)


def test_all_violating_doc(ray_session):
    import ray.data as rd

    table = _docs([("bad", [
        _span(kind="video", text=None, ref="nope", off=-1),
        _span(kind="video", text=None, ref="nope", off=-1),
    ])])
    res = validate(DatasetSource(rd.from_arrow(table)),
                   catalog_keys=pa.array(["media://0123456789abcdef"]))
    got = set(zip(res.table().column("doc_id").to_pylist(),
                  res.table().column("rule_id").to_pylist(),
                  res.table().column("span_index").to_pylist()))
    want = oracle_violations(table.to_pylist(), default_plan(),
                             {"media://0123456789abcdef"})
    assert got == want
    assert len(want) >= 8  # kind_enum + format + ref + nonneg per span…
