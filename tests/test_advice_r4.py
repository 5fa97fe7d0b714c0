"""Round-4 ADVICE.md regression tests.

Each test pins one of the four defects the round-3 advisor reported:
empty-catalog NameError, unpinned hash backend, inline-(?m) dollar
semantics, and hash_join null-key matching.
"""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.functions.catalog import CatalogIndex, _hash_pair
from jsonschema_ray.spec.ecmaregex import (
    UnsupportedRegexError, ecma_compile, translate_ecma)


class TestCatalogEmptyIndex:
    def test_empty_index_all_false(self):
        idx = CatalogIndex(pa.array([], type=pa.string()))
        out = idx.contains(pa.array(["a", "b", None]))
        assert out.dtype == bool and not out.any() and len(out) == 3

    def test_empty_index_empty_probe(self):
        idx = CatalogIndex(pa.array([], type=pa.string()))
        assert len(idx.contains(pa.array([], type=pa.string()))) == 0


class TestCatalogBackendPinning:
    def test_backend_recorded_and_reused(self):
        idx = CatalogIndex(pa.array(["x", "y"]))
        assert idx.backend in ("polars", "pandas")
        hits = idx.contains(pa.array(["x", "z", None]))
        assert hits.tolist() == [True, False, False]

    def test_explicit_backend_consistency(self):
        arr = pa.array(["a", "b", "c"])
        h1a, h2a, b = _hash_pair(arr)
        h1b, h2b, b2 = _hash_pair(arr, backend=b)
        assert b == b2
        np.testing.assert_array_equal(h1a, h1b)
        np.testing.assert_array_equal(h2a, h2b)

    def test_pandas_backend_probe_matches(self):
        # force the fallback backend end-to-end: build + probe both pandas
        arr = pa.array(["k1", "k2"])
        h1, h2, b = _hash_pair(arr, backend="pandas")
        assert b == "pandas"
        idx = CatalogIndex(arr)
        idx.backend = "pandas"
        idx.h1, idx.h2 = np.sort(h1), h2[np.argsort(h1, kind="stable")]
        assert idx.contains(pa.array(["k1", "nope"])).tolist() == [True, False]


class TestEcmaMultilineDollar:
    def test_plain_dollar_is_endonly(self):
        # DOLLAR_ENDONLY: no match before a trailing newline
        assert ecma_compile("^a$").search("a\n") is None
        assert ecma_compile("^a$").search("a") is not None

    def test_global_multiline_flag_at_start(self):
        rx = ecma_compile("(?m)^b$")
        assert rx.search("a\nb\nc") is not None

    def test_scoped_multiline_group(self):
        # (?m:...) — $ inside the scope matches at line ends
        rx = ecma_compile(r"(?m:b$)")
        assert rx.search("b\nc") is not None
        # outside the scope the next $ is still end-only
        rx2 = ecma_compile(r"(?m:b$)[\s\S]*c$")
        assert rx2.search("b\nc\n") is None
        assert rx2.search("b\nc") is not None

    def test_negated_scope_restores_endonly(self):
        assert translate_ecma(r"(?m)(?-m:a$)").endswith(r"a\Z)")

    def test_mid_pattern_global_m_raises(self):
        with pytest.raises(UnsupportedRegexError):
            translate_ecma(r"a(?m)b$")

    def test_dollar_in_class_untouched(self):
        assert translate_ecma(r"[$]") == "[$]"
        assert ecma_compile(r"[$]+").fullmatch("$$") is not None

    def test_flag_group_without_m_unaffected(self):
        # (?s) at start: no multiline, $ still \Z
        assert translate_ecma(r"(?s)a.$") == r"(?s)a.\Z"

    def test_nested_groups_scope_tracking(self):
        # group nesting around an m-scope must not leak the flag
        t = translate_ecma(r"((?m:x$))y$")
        assert t == r"((?m:x$))y\Z"


class TestHashJoinNullKeys:
    def test_inner_drops_null_keys(self, ray_session):
        import ray

        from jsonschema_ray.pipelines.joins import hash_join

        left = ray.data.from_arrow(pa.table({
            "k": ["a", None, "b", None], "lv": [1, 2, 3, 4]}))
        right = ray.data.from_arrow(pa.table({
            "k": [None, "a", None], "rv": [10, 20, 30]}))
        out = hash_join(left, right, on="k").to_pandas()
        # SQL: only the a<->a pair matches; null keys never equal
        assert out[["k", "lv", "rv"]].values.tolist() == [["a", 1, 20]]

    def test_left_keeps_null_key_left_rows_unmatched(self, ray_session):
        import ray

        from jsonschema_ray.pipelines.joins import hash_join

        left = ray.data.from_arrow(pa.table({
            "k": ["a", None], "lv": [1, 2]}))
        right = ray.data.from_arrow(pa.table({
            "k": [None, "a"], "rv": [10, 20]}))
        out = hash_join(left, right, on="k", how="left").to_pandas()
        out = out.sort_values("lv").reset_index(drop=True)
        assert out["lv"].tolist() == [1, 2]
        assert out["rv"].tolist()[0] == 20
        assert out["rv"].isna().tolist() == [False, True]

    def test_null_semantics_match_duckdb(self, ray_session):
        import duckdb
        import ray

        from jsonschema_ray.pipelines.joins import hash_join

        lt = pa.table({"k": ["a", "b", None, "c", None],
                       "lv": [1, 2, 3, 4, 5]})
        rt = pa.table({"k": ["b", None, "c", "c"], "rv": [6, 7, 8, 9]})
        for how in ("inner", "left"):
            got = hash_join(ray.data.from_arrow(lt),
                            ray.data.from_arrow(rt),
                            on="k", how=how).to_pandas()
            got = got.sort_values(["lv", "rv"]).reset_index(drop=True)
            con = duckdb.connect()
            con.register("l", lt)
            con.register("r", rt)
            want = con.execute(
                f"SELECT l.k, l.lv, r.rv FROM l {how.upper()} JOIN r "
                "ON l.k = r.k ORDER BY l.lv, r.rv").df()
            import pandas as pd

            assert got["lv"].tolist() == want["lv"].tolist()
            norm = lambda s: [None if pd.isna(x) else int(x) for x in s]
            assert norm(got["rv"]) == norm(want["rv"])
