"""rdf verb: x-jsonld-* promotion to expanded JSON-LD.

The product-catalog case pins the reference's own documented
input/output pair (/root/reference/docs/rdf.markdown:118-222) verbatim.
"""

from __future__ import annotations

import json

import pytest

from jsonschema_ray.spec.jsonld import ResolutionError, promote

PRODUCT_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "x-jsonld-type": "https://schema.org/Product",
    "properties": {
        "sku": {"type": "string", "x-jsonld-id": "https://schema.org/sku"},
        "name": {"type": "string", "x-jsonld-id": "https://schema.org/name"},
        "releaseDate": {
            "type": "string", "format": "date",
            "x-jsonld-id": "https://schema.org/releaseDate",
            "x-jsonld-datatype": "http://www.w3.org/2001/XMLSchema#date",
        },
        "keywords": {
            "type": "array",
            "x-jsonld-id": "https://schema.org/keywords",
            "x-jsonld-container": "@list",
            "items": {"type": "string"},
        },
        "weight": {
            "type": "number",
            "x-jsonld-id": "https://schema.org/weight",
            "x-jsonld-value": "https://schema.org/value",
            "x-jsonld-type": "https://schema.org/QuantitativeValue",
            "x-jsonld-constants": {"https://schema.org/unitCode": "KGM"},
        },
        "manufacturer": {
            "type": "object",
            "x-jsonld-id": "https://schema.org/manufacturer",
            "x-jsonld-type": "https://schema.org/Organization",
            "properties": {
                "name": {"type": "string",
                         "x-jsonld-id": "https://schema.org/name"},
                "url": {"type": "string",
                        "x-jsonld-id": "https://schema.org/sameAs",
                        "x-jsonld-self": "{+this}"},
            },
        },
    },
}

PRODUCT_INSTANCE = {
    "sku": "ABC-123",
    "name": "Vacuum Robot",
    "releaseDate": "2026-01-15",
    "keywords": ["vacuum", "robot"],
    "weight": 2.5,
    "manufacturer": {"name": "ACME", "url": "https://acme.example.com"},
}

PRODUCT_EXPANDED = [{
    "@type": ["https://schema.org/Product"],
    "https://schema.org/keywords": [
        {"@list": [{"@value": "vacuum"}, {"@value": "robot"}]}],
    "https://schema.org/manufacturer": [{
        "@type": ["https://schema.org/Organization"],
        "https://schema.org/name": [{"@value": "ACME"}],
        "https://schema.org/sameAs": [{"@id": "https://acme.example.com"}],
    }],
    "https://schema.org/name": [{"@value": "Vacuum Robot"}],
    "https://schema.org/releaseDate": [
        {"@value": "2026-01-15",
         "@type": "http://www.w3.org/2001/XMLSchema#date"}],
    "https://schema.org/sku": [{"@value": "ABC-123"}],
    "https://schema.org/weight": [{
        "@type": ["https://schema.org/QuantitativeValue"],
        "https://schema.org/value": [{"@value": 2.5}],
        "https://schema.org/unitCode": [{"@value": "KGM"}],
    }],
}]


def test_reference_docs_example_matches_exactly():
    assert promote(PRODUCT_SCHEMA, PRODUCT_INSTANCE) == PRODUCT_EXPANDED


def test_invalid_instance_refuses_promotion():
    with pytest.raises(ValueError, match="does not match"):
        promote(PRODUCT_SCHEMA, {"sku": 42})


def test_wrong_dialect_rejected():
    sch = dict(PRODUCT_SCHEMA, **{
        "$schema": "http://json-schema.org/draft-07/schema#"})
    with pytest.raises(ValueError, match="2019-09 or 2020-12"):
        promote(sch, PRODUCT_INSTANCE)


def test_language_reverse_self_schemes_and_json():
    sch = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {
            "title": {"type": "string",
                      "x-jsonld-id": "https://ex.org/title",
                      "x-jsonld-language": "en-US"},
            "email": {"type": "string",
                      "x-jsonld-id": "https://ex.org/mbox",
                      "x-jsonld-self": "mailto"},
            "parent": {"type": "string",
                       "x-jsonld-reverse": "https://ex.org/childOf"},
            "blob": {"x-jsonld-id": "https://ex.org/blob",
                     "x-jsonld-json": True},
        },
    }
    out = promote(sch, {"title": "hi", "email": "A b@Example.COM",
                        "parent": "p1", "blob": {"x": [1]}})
    node = out[0]
    assert node["https://ex.org/title"] == [
        {"@value": "hi", "@language": "en-US"}]
    # mailto scheme: local part percent-encoded, domain lowercased
    assert node["https://ex.org/mbox"] == [
        {"@id": "mailto:A%20b@example.com"}]
    assert node["@reverse"] == {
        "https://ex.org/childOf": [{"@value": "p1"}]}
    assert node["https://ex.org/blob"] == [
        {"@value": {"x": [1]}, "@type": "@json"}]


def test_self_uri_template_sibling_variable():
    sch = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "x-jsonld-self": "https://ex.org/p/{slug}",
        "x-jsonld-type": "https://ex.org/Page",
        "properties": {
            "slug": {"type": "string"},
        },
    }
    out = promote(sch, {"slug": "a b"})
    assert out[0]["@id"] == "https://ex.org/p/a%20b"


def test_annotations_through_ref_and_unsupported_keyword():
    sch = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {"n": {"$ref": "#/$defs/name"}},
        "$defs": {"name": {"type": "string",
                           "x-jsonld-id": "https://ex.org/name"}},
    }
    out = promote(sch, {"n": "x"})
    assert out[0]["https://ex.org/name"] == [{"@value": "x"}]

    # @graph wrapping (pass_keyword_graph.sh semantics)
    graph = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "x-jsonld-graph": True,
        "properties": {"m": {"type": "object",
                             "x-jsonld-id": "https://ex.org/member",
                             "x-jsonld-type": "https://ex.org/Person"}},
    }
    out = promote(graph, {"m": {}})
    assert out == [{"@graph": [{"https://ex.org/member":
                                [{"@type": ["https://ex.org/Person"]}]}]}]
    # conflicting single-value annotations without override reject
    bad = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {"p": {
            "x-jsonld-id": "https://ex.org/p",
            "allOf": [{"x-jsonld-datatype": "https://ex.org/a"},
                      {"x-jsonld-datatype": "https://ex.org/b"}]}},
    }
    with pytest.raises(ResolutionError, match="more than one value"):
        promote(bad, {"p": 1})


def test_rdf_cli_single_instance(tmp_path, capsys):
    from jsonschema_ray.cli import main

    s = tmp_path / "schema.json"
    i = tmp_path / "inst.json"
    s.write_text(json.dumps(PRODUCT_SCHEMA))
    i.write_text(json.dumps(PRODUCT_INSTANCE))
    assert main(["rdf", str(s), str(i)]) == 0
    out = capsys.readouterr().out
    assert json.loads(out) == PRODUCT_EXPANDED
    # invalid instance → exit 2
    i.write_text(json.dumps({"sku": 42}))
    assert main(["rdf", str(s), str(i)]) == 2


def test_rdf_table_mode_distributed(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.cli import main

    s = tmp_path / "schema.json"
    s.write_text(json.dumps(PRODUCT_SCHEMA))
    rows = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "props": pa.array([json.dumps(PRODUCT_INSTANCE),
                           json.dumps({"sku": 42})]),
    })
    inp = tmp_path / "rows.parquet"
    pq.write_table(rows, str(inp))
    outdir = tmp_path / "out"
    assert main(["rdf", str(s), "--table", str(inp),
                 "--column", "props", "-o", str(outdir)]) == 0
    got = pq.read_table(str(outdir)).to_pylist()
    got = {r["doc_id"]: r for r in got}
    assert json.loads(got["a"]["jsonld"]) == PRODUCT_EXPANDED
    assert got["a"]["jsonld_ok"] is True
    assert got["b"]["jsonld"] is None and got["b"]["jsonld_ok"] is False
