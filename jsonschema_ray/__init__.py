"""jsonschema_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimagining of the capabilities of sourcemeta/jsonschema
(the JSON Schema CLI) as distributed ``ray.data.Dataset`` operators over
Arrow tables of interleaved text+media documents:

- declarative **CheckPlans** (the analog of compiled Blaze templates,
  ``/root/reference/vendor/blaze/src/evaluator/include/sourcemeta/blaze/evaluator.h:38-47``)
  compile to vectorized pyarrow.compute kernels evaluated via
  ``map_batches`` over zero-copy Arrow batches;
- dataset-scope checks (doc_id uniqueness, referential media_ref →
  catalog, column stats / HLL distinct / t-digest drift) expressed as
  partial-aggregate + small shuffles or broadcast lookups;
- violation rows keyed by ``(doc_id, rule_id, span_index)`` with
  per-partition pass/fail verdicts (the exit-code-2 analog,
  ``/root/reference/src/exit_code.h:6-11``);
- checkpointed, resumable runs with per-partition lineage manifests.

Nothing here calls ``ray.init()``: the session is owned by the caller
(driver, bench.py, or the pytest fixture).
"""

from jsonschema_ray.spec.plan import CheckPlan, Rule, default_plan
from jsonschema_ray.pipelines.validate import validate

__all__ = ["CheckPlan", "Rule", "default_plan", "validate"]
__version__ = "16.7.0"  # tracks the reference CLI release whose behavior this engine reproduces (/root/reference/VERSION)
