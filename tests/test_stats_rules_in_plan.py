"""stats / drift rule kinds flowing through validate() itself."""

from jsonschema_ray.pipelines.stats import ProfileSpec, profile
from jsonschema_ray.pipelines.validate import validate
from jsonschema_ray.sources.readers import DatasetSource, SynthSource
from jsonschema_ray.sources.synth import GenConfig, docs_table
from jsonschema_ray.spec.plan import CheckPlan, Rule


def test_stats_rule_violation_in_validate(ray_session):
    import ray.data as rd

    table = docs_table(GenConfig(n_docs=500, clean=True))
    plan = CheckPlan(rules=[
        Rule("offset_in_range", kind="stats", scope="doc",
             params={"column": "spans.offset", "min_value": 0,
                     "max_value": 10},   # real max ≫ 10 → violation
             message="span offsets exceed configured bound"),
        Rule("doc_id_cardinality", kind="stats", scope="doc",
             params={"column": "doc_id", "distinct_min": 400},  # holds
             message="too few distinct doc ids"),
    ])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    t = res.table()
    rules = set(t.column("rule_id").to_pylist())
    assert rules == {"offset_in_range"}
    assert t.column("doc_id").to_pylist() == ["column:spans.offset"]
    assert not res.overall_pass()


def test_drift_rule_in_validate(ray_session):
    # baseline profile from one clean generation
    base_src = SynthSource(GenConfig(n_docs=2000, clean=True, seed=42))
    base = profile(base_src, [ProfileSpec(column="spans.offset",
                                          hll=False, tdigest=True)])

    same = SynthSource(GenConfig(n_docs=2000, clean=True, seed=77))
    plan_ok = CheckPlan(rules=[
        Rule("offset_drift", kind="drift", scope="doc",
             params={"column": "spans.offset",
                     "baseline": base["spans.offset"], "tolerance": 0.1},
             message="offset distribution drifted")])
    assert validate(same, plan_ok).overall_pass()

    # shifted distribution: offsets step 1..50 → same gen but truncated
    # span counts shift the offset distribution strongly
    shifted = SynthSource(GenConfig(n_docs=2000, clean=True, seed=77,
                                    rate_swap=0))
    import numpy as np

    # build a synthetic shifted baseline instead: scale quantiles 2x
    from jsonschema_ray.functions.sketches import TDigest

    td = TDigest.deserialize(bytes.fromhex(base["spans.offset"]["tdigest"]))
    td2 = TDigest(td.delta, td.means * 2.0, td.weights)
    shifted_base = dict(base["spans.offset"], tdigest=td2.serialize().hex())
    plan_bad = CheckPlan(rules=[
        Rule("offset_drift", kind="drift", scope="doc",
             params={"column": "spans.offset",
                     "baseline": shifted_base, "tolerance": 0.1},
             message="offset distribution drifted")])
    res = validate(same, plan_bad)
    t = res.table()
    assert t.column("rule_id").to_pylist() == ["offset_drift"]
    assert res.exit_code() == 2
