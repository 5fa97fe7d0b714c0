"""Version-pin of the Lance shim against the INSTALLED Ray's
LanceDatasource source (round-4 verdict #8: real pylance is not
installable in this sandbox — no network — so the shim's contract is
pinned to what this Ray version actually calls).

Two directions:
1. Ray-side drift detection: every `lance` API touchpoint the shim
   implements must still appear verbatim in Ray's
   ``lance_datasource.py`` — if a Ray upgrade renames or adds calls,
   this fails and names the drift.
2. Shim-side conformance: exercising exactly those touchpoints against
   the shim produces working reads.
"""

import importlib.util
import inspect

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

#: the lance-API expressions Ray 2.49's LanceDatasource evaluates,
#: verified against ray/data/_internal/datasource/lance_datasource.py
RAY_TOUCHPOINTS = [
    "lance.dataset(uri=uri, storage_options=storage_options)",
    "self.lance_ds.get_fragments()",
    "f.metadata.id",
    "f.count_rows()",
    "f.data_files()",
    "data_file.path()",
    "fragments[0].schema",
    "lance_ds.get_fragment(id)",
    "lance_ds.scanner(**scanner_options)",
    "scanner.to_reader()",
    'scanner_options["columns"]',
    'scanner_options["filter"]',
    'scanner_options["fragments"]',
]


def _ray_lance_source() -> str:
    from ray.data._internal.datasource import lance_datasource

    return inspect.getsource(lance_datasource)


def test_ray_datasource_still_uses_pinned_api():
    src = _ray_lance_source()
    missing = [t for t in RAY_TOUCHPOINTS if t not in src]
    assert not missing, (
        "Ray's LanceDatasource no longer matches the pinned lance API; "
        f"update tests/fake_lance.py for: {missing}")


def test_shim_conforms_to_pinned_api(tmp_path):
    if importlib.util.find_spec("lance") is not None:
        pytest.skip("real pylance present; shim pin not applicable")
    from tests.fake_lance import install_fake_lance, uninstall_fake_lance

    path = str(tmp_path / "pin.parquet")
    pq.write_table(pa.table({"a": list(range(10)),
                             "b": [f"s{i}" for i in range(10)]}), path)
    lance = install_fake_lance()
    try:
        # the exact call sequence LanceDatasource makes
        ds = lance.dataset(uri=path, storage_options=None)
        frags = ds.get_fragments()
        assert len(frags) >= 1
        total = 0
        for f in frags:
            assert isinstance(f.metadata.id, int)
            total += f.count_rows()
            assert all(isinstance(df.path(), str) for df in f.data_files())
        assert total == 10
        assert frags[0].schema.names == ["a", "b"]
        refetched = [ds.get_fragment(f.metadata.id) for f in frags]
        scanner_options = {"columns": ["a"], "fragments": refetched}
        scanner = ds.scanner(**scanner_options)
        batches = list(scanner.to_reader())
        tab = pa.Table.from_batches(batches)
        assert tab.column_names == ["a"] and tab.num_rows == 10
        # the filter key must at least be accepted (Ray sets it when
        # the caller passes one)
        ds.scanner(columns=["a"], filter=None,
                   fragments=refetched).to_reader()
    finally:
        uninstall_fake_lance()
