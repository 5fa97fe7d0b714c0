"""Dataset-scale fmt/upgrade: the distributed actor-pool stages must
match the single-document machinery document-for-document."""

import json

import pyarrow as pa
import ray.data as rd

from jsonschema_ray.pipelines.lintscale import synth_schema_corpus
from jsonschema_ray.pipelines.schemaops import (FormatSchemasBatch,
                                                UpgradeSchemasBatch,
                                                format_schemas,
                                                upgrade_schemas)
from jsonschema_ray.spec.alterschema import upgrade_schema
from jsonschema_ray.spec.format import prettify_schema


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


def test_format_distributed_matches_local(ray_session):
    table = synth_schema_corpus(120, seed=3)
    want = FormatSchemasBatch()(table)
    ds = rd.from_arrow(table).repartition(6)
    got = _collect(format_schemas(ds)).sort_by("schema_id")
    want = want.sort_by("schema_id")
    assert got.equals(want)
    # every successfully formatted doc matches the single-doc formatter
    for sid, raw, text in zip(table.column("schema_id").to_pylist(),
                              table.column("schema").to_pylist(),
                              want.column("formatted").to_pylist()):
        if text is not None:
            assert text == prettify_schema(json.loads(raw))
    # formatting is idempotent: formatting the output changes nothing
    again = pa.table({"schema_id": want.column("schema_id"),
                      "schema": want.column("formatted")})
    second = FormatSchemasBatch()(again)
    assert not any(second.column("changed").to_pylist())


def test_upgrade_distributed_matches_local(ray_session):
    docs = [
        {"$schema": "http://json-schema.org/draft-04/schema#",
         "id": "https://x.example/a",
         "definitions": {"d": {"type": "integer"}},
         "properties": {"a": {"$ref": "#/definitions/d"}}},
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "type": "array", "items": [{"type": "string"}],
         "additionalItems": False},
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "type": "string"},
    ] * 20
    table = pa.table({
        "schema_id": pa.array([f"u{i}" for i in range(len(docs))]),
        "schema": pa.array([json.dumps(d) for d in docs])})
    ds = rd.from_arrow(table).repartition(4)
    got = _collect(upgrade_schemas(ds)).sort_by("schema_id")
    want = UpgradeSchemasBatch()(table).sort_by("schema_id")
    assert got.equals(want)
    for raw, up in zip(table.sort_by("schema_id").column(
            "schema").to_pylist(), want.column("upgraded").to_pylist()):
        assert up is not None
        assert json.loads(up) == upgrade_schema(json.loads(raw))
        assert json.loads(up)["$schema"] == \
            "https://json-schema.org/draft/2020-12/schema"


def test_metaschema_distributed_matches_local(ray_session):
    from jsonschema_ray.pipelines.schemaops import (MetaschemaBatch,
                                                    metaschema_check)

    docs = [
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "type": "string"},                               # valid
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "type": 42},                                     # invalid type
        {"$schema": "http://json-schema.org/draft-04/schema#",
         "exclusiveMinimum": True, "minimum": 1},         # valid draft-4
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "required": "nope"},                             # invalid
    ] * 15
    table = pa.table({
        "schema_id": pa.array([f"m{i}" for i in range(len(docs))]),
        "schema": pa.array([json.dumps(d) for d in docs])})
    want = MetaschemaBatch()(table).sort_by("schema_id")
    ds = rd.from_arrow(table).repartition(4)
    got = _collect(metaschema_check(ds)).sort_by("schema_id")
    assert got.equals(want)
    verdicts = dict(zip(want.column("schema_id").to_pylist(),
                        want.column("valid").to_pylist()))
    assert verdicts["m0"] is True
    assert verdicts["m1"] is False
    assert verdicts["m2"] is True
    assert verdicts["m3"] is False
