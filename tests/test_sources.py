"""Source formats: JSONL (+gzip), parquet pruning, synth regeneration."""

import gzip
import json

import pyarrow.parquet as pq


def _write_jsonl(path, table, compress=False):
    rows = table.to_pylist()
    data = "\n".join(json.dumps(r) for r in rows).encode()
    if compress:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def test_jsonl_and_gzip_roundtrip(tmp_path, ray_session):
    """The reference's flagship input (JSONL, transparent gzip,
    input.h:279-338) feeds the same validate pipeline."""
    from jsonschema_ray.pipelines.validate import validate
    from jsonschema_ray.sources.readers import JsonlSource
    from jsonschema_ray.sources.synth import GenConfig, catalog_table, docs_table
    from jsonschema_ray.spec.plan import default_plan
    from tests.oracle import oracle_violations

    cfg = GenConfig(n_docs=300)
    table = docs_table(cfg)
    cat = catalog_table(cfg).column("media_ref").combine_chunks()
    expected = oracle_violations(table.to_pylist(), default_plan(),
                                 set(cat.to_pylist()))

    plain = tmp_path / "docs.jsonl"
    gz = tmp_path / "docs.jsonl.gz"
    _write_jsonl(plain, table)
    _write_jsonl(gz, table, compress=True)

    for path in (plain, gz):
        res = validate(JsonlSource(str(path)), catalog_keys=cat)
        t = res.table()
        got = set(zip(t.column("doc_id").to_pylist(),
                      t.column("rule_id").to_pylist(),
                      t.column("span_index").to_pylist()))
        assert got == expected, path


def test_parquet_column_pruning(tmp_path, ray_session):
    from jsonschema_ray.sources.readers import ParquetSource
    from jsonschema_ray.sources.synth import GenConfig, docs_table

    p = tmp_path / "docs.parquet"
    pq.write_table(docs_table(GenConfig(n_docs=100)), p)
    src = ParquetSource(str(p))
    ds = src.dataset(columns=["doc_id"])
    assert ds.schema().names == ["doc_id"]
    assert ds.count() == 100
