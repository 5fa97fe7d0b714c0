"""A minimal in-process `lance` API shim backed by a parquet file.

pylance is not installed in this sandbox; this shim implements exactly
the surface Ray's LanceDatasource touches (``lance.dataset`` →
fragments with metadata/count_rows/data_files/schema → ``scanner``
with fragments/columns → ``to_reader``) so the repo's
``LanceSource``/``ray.data.read_lance`` path executes for real in
tests. Classes are registered under module name ``lance`` and pickle
by value into Ray read tasks.
"""

from __future__ import annotations

import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq


def install_fake_lance() -> types.ModuleType:
    """Create and register the shim as ``sys.modules['lance']``.
    Returns the module; call ``uninstall_fake_lance`` to undo."""
    if "lance" in sys.modules:
        return sys.modules["lance"]
    mod = types.ModuleType("lance")

    class _Meta:
        def __init__(self, id):
            self.id = id

    class _DataFile:
        def __init__(self, p):
            self._p = p

        def path(self):
            return self._p

    class _Fragment:
        def __init__(self, ds, id):
            self._ds, self.metadata = ds, _Meta(id)
            self.schema = ds._table.schema

        def count_rows(self):
            return len(self._ds._parts[self.metadata.id])

        def data_files(self):
            return [_DataFile(f"{self._ds._uri}#frag{self.metadata.id}")]

    class _Scanner:
        def __init__(self, tbl):
            self._tbl = tbl

        def to_reader(self):
            return self._tbl.to_batches()

    class _Dataset:
        def __init__(self, uri, storage_options=None):
            self._uri = uri
            self._table = pq.read_table(uri)
            n = self._table.num_rows
            self._parts = [self._table.slice(0, n // 2),
                           self._table.slice(n // 2)]

        def get_fragments(self):
            return [_Fragment(self, i) for i in range(len(self._parts))]

        def get_fragment(self, id):
            return _Fragment(self, id)

        def scanner(self, fragments=None, columns=None, **kw):
            parts = [self._parts[f.metadata.id]
                     for f in (fragments or self.get_fragments())]
            t = pa.concat_tables(parts)
            if columns:
                t = t.select(columns)
            return _Scanner(t)

    for cls in (_Meta, _DataFile, _Fragment, _Scanner, _Dataset):
        cls.__module__ = "lance"
        setattr(mod, cls.__name__, cls)
    mod.dataset = lambda uri, storage_options=None: _Dataset(
        uri, storage_options)
    sys.modules["lance"] = mod
    return mod


def uninstall_fake_lance() -> None:
    mod = sys.modules.get("lance")
    if isinstance(mod, types.ModuleType) and mod.__spec__ is None:
        del sys.modules["lance"]
