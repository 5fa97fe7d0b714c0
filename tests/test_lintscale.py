"""Dataset-scale lint: the distributed actor-pool path must produce
exactly the findings the single-document registry produces."""

import json

import pyarrow as pa
import ray.data as rd

from jsonschema_ray.pipelines.lintscale import (LintSchemasBatch,
                                                lint_schemas,
                                                synth_schema_corpus)
from jsonschema_ray.spec import lintrules as LR


def _local_findings(table: pa.Table, **kw) -> set:
    actor = LintSchemasBatch(**kw)
    out = actor(table)
    return set(zip(out.column("schema_id").to_pylist(),
                   out.column("rule_id").to_pylist(),
                   out.column("location").to_pylist()))


def test_distributed_matches_local(ray_session):
    table = synth_schema_corpus(200)
    want = _local_findings(table)
    assert want, "corpus should produce findings"
    ds = rd.from_arrow(table).repartition(8)
    got_tab = pa.concat_tables(
        list(lint_schemas(ds).iter_batches(batch_format="pyarrow",
                                           batch_size=None)))
    got = set(zip(got_tab.column("schema_id").to_pylist(),
                  got_tab.column("rule_id").to_pylist(),
                  got_tab.column("location").to_pylist()))
    assert got == want


def test_findings_match_registry_check():
    """The batch actor agrees with calling the registry directly."""
    doc = {"$schema": "http://json-schema.org/draft-04/schema#",
           "title": "T", "description": "D",
           "type": "string", "enum": ["a", "a"]}
    table = pa.table({"schema_id": ["x"],
                      "schema": [json.dumps(doc)]})
    got = _local_findings(table)
    rules = LR.build_registry()
    want = set()

    def cb(pointer, name, message, result, _applied):
        for loc in (result.locations or [()]):
            want.add(("x", name, LR.ptr_str(pointer + tuple(loc))))

    LR.check(doc, rules, cb)
    assert got == want
    assert ("x", "duplicate_enum_values", "/enum") in got
    assert ("x", "enum_with_type", "/type") in got


def test_only_exclude_filters():
    table = synth_schema_corpus(50)
    only = _local_findings(table, only=["duplicate_enum_values"])
    assert only and all(r == "duplicate_enum_values"
                        for _s, r, _l in only)
    excl = _local_findings(table, exclude=["duplicate_enum_values"])
    assert all(r != "duplicate_enum_values" for _s, r, _l in excl)
