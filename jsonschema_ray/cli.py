"""CLI verbs — the reference's command surface re-expressed for the
Ray engine (``/root/reference/src/main.cc:160-287`` dispatches 14
commands; the data-scale ones distribute, the schema-scale ones stay
driver-side, SURVEY.md §2.11).

    python -m jsonschema_ray compile RULES.json [-o PLAN.json] [--fast] [-O]
    python -m jsonschema_ray compile --schema SCHEMA.json [-o PLAN.json]
    python -m jsonschema_ray validate --plan PLAN.json INPUT.parquet...
        [--catalog CAT.parquet] [--out DIR] [--fast] [--fail-fast]
        [--trace N] [--only a,b] [--exclude a,b] [--num-cpus N]
        [--extension json --ignore build/]
    python -m jsonschema_ray validate --schema SCHEMA.{json,yaml} INPUTS...
        (inputs: parquet | jsonl[.gz] | yaml | "-" for stdin JSONL;
         --checked = position-tracked parse, errors as path:line:col)
    python -m jsonschema_ray validate --schema S.json --instance DOC.json...
        [-F/--format-assertion] [--continue]  (JSONL instances validate
        per entry: fail-fast with `(entry #N)` unless --continue)
    python -m jsonschema_ray bundle SCHEMA.json [-o OUT.json]
        [--store DIR] [--http]
    python -m jsonschema_ray install [URI...] [--to DIR] [--force | --frozen]
        (no URIs: the project config's `dependencies` map)
    python -m jsonschema_ray metaschema PLAN.json
    python -m jsonschema_ray fmt PLAN.json [--check]
    python -m jsonschema_ray fmt --schema SCHEMA.json [--check]
        [--indentation N] [--keep-ordering]  (canonical keyword order)
    python -m jsonschema_ray lint PLAN.json [--fix]
    python -m jsonschema_ray lint --schema SCHEMA.json [--fix]
        (alterschema canonicalizer to fixpoint)
    python -m jsonschema_ray upgrade PLAN.json | --schema OLD.json
    python -m jsonschema_ray codegen PLAN.json | --schema S.json
        --target typescript [--name T]
    python -m jsonschema_ray test SUITE.json --plan PLAN.json
    python -m jsonschema_ray inspect [PLAN.json | --schema SCHEMA.json]
    python -m jsonschema_ray version

A `jsonschema.json` project config (ancestor-discovered) supplies
defaultDialect / resolve remaps / extension / ignore / dependencies
(docs/configuration.markdown analog).

Exit codes mirror ``/root/reference/src/exit_code.h:6-11``: 0 success,
1 usage/other error, 2 validation (or fmt --check / lint) failure,
6 empty test suite.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any

EXIT_OK = 0
EXIT_ERROR = 1
EXIT_VALIDATION = 2
EXIT_ARGS = 5
EXIT_EMPTY_SUITE = 6

import re as _re_mod  # noqa: E402

_RE_ERROR = _re_mod.error


def _load_plan(path: str):
    from jsonschema_ray.spec.plan import CheckPlan, default_plan

    if path in (None, "default"):
        return default_plan()
    with open(path) as f:
        return CheckPlan.from_json(json.load(f))


def _plan_from_args(args):
    """``--schema schema.json`` is the reference's front door (validate a
    real JSON Schema document, ``src/command_validate.cc``): compile it
    to a CheckPlan via the columnar front-end; otherwise ``--plan``."""
    if getattr(args, "schema", None):
        from jsonschema_ray.spec.jschema import schema_to_plan

        return schema_to_plan(
            _load_schema_doc(args.schema),
            assert_formats=bool(getattr(args, "format_assertion", False)))
    return _load_plan(args.plan)


def _input_source(inputs: list[str]):
    """Pick a DocSource from the input paths: parquet (default), JSONL
    (.json/.jsonl/.gz), YAML (.yaml/.yml), or "-" for JSONL on stdin
    (the reference's stdin mode, ``src/input.h:197-226`` — driver-side
    by nature)."""
    from jsonschema_ray.sources.readers import (
        DatasetSource, JsonlSource, ParquetSource, YamlSource)

    if inputs == ["-"]:
        import ray.data as rd

        rows = [json.loads(line) for line in sys.stdin if line.strip()]
        return DatasetSource(rd.from_items(rows))
    exts = {p.rsplit(".", 1)[-1].lower() for p in inputs if "." in p}
    if exts <= {"yaml", "yml"} and exts:
        return YamlSource(inputs)
    if exts <= {"json", "jsonl", "gz", "ndjson"} and exts:
        return JsonlSource(inputs)
    return ParquetSource(inputs)


def _load_schema_doc(path: str, *, configured: bool = True):
    """Schema documents may be JSON or YAML (the reference accepts both
    via --yaml; README.markdown input handling). Unless disabled, a
    ``jsonschema.json`` project config discovered by ancestor walk from
    the schema's directory is applied: ``defaultDialect`` stamps
    ``$schema`` when absent, and ``resolve`` mappings are mounted so
    absolute-URI ``$ref``s work (``docs/configuration.markdown``)."""
    with open(path) as f:
        if path.lower().endswith((".yaml", ".yml")):
            import yaml

            doc = yaml.safe_load(f)
        else:
            doc = json.load(f)
    if configured:
        from jsonschema_ray.state.config import apply_to_schema, discover

        doc = apply_to_schema(doc, discover(path), path)
    return doc


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    from jsonschema_ray.raycompat import quiet_empty_schema_warnings

    quiet_empty_schema_warnings()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


# ---------------------------------------------------------------------------
# verbs
# ---------------------------------------------------------------------------

def cmd_compile(args) -> int:
    """Rule specs → canonical serialized CheckPlan (``--schema`` /
    CheckPlan positional), or (reference UX) a JSON Schema DOCUMENT →
    the blaze Template JSON dump (``src/command_compile.cc``)."""
    import os as _os

    paths = list(getattr(args, "paths", None) or [])
    rules_arg = paths[0] if paths else None
    args.rules = rules_arg
    plan_mode = False
    if rules_arg == "default":
        plan_mode = True
    elif rules_arg and not getattr(args, "schema", None) \
            and _os.path.isfile(rules_arg):
        try:
            with open(rules_arg) as _f:
                head = json.load(_f)
        except Exception:   # noqa: BLE001 — not a plan
            head = None
        if isinstance(head, dict) and isinstance(head.get("rules"),
                                                 list) \
                and "version" in head and "$schema" not in head:
            plan_mode = True
    if not plan_mode and not getattr(args, "schema", None):
        from jsonschema_ray.spec.compile_cli import run as _ref_compile

        return _ref_compile(args)
    if getattr(args, "schema", None):
        from jsonschema_ray.spec.jschema import schema_to_plan

        plan = schema_to_plan(_load_schema_doc(args.schema))
    elif not args.rules:
        print("compile: need RULES.json or --schema SCHEMA.json",
              file=sys.stderr)
        return EXIT_ERROR
    else:
        plan = _load_plan(args.rules)
    if getattr(args, "optimize", False):
        from jsonschema_ray.spec.optimize import optimize_plan

        plan = optimize_plan(plan)
    plan.mode = "fast" if args.fast else plan.mode
    out = json.dumps(plan.to_json(), indent=2, sort_keys=True)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out + "\n")
    else:
        print(out)
    print(f"plan_hash: {plan.plan_hash()}", file=sys.stderr)
    return EXIT_OK


def _load_resolve_docs(paths, schema_path: str,
                       debug: bool = False,
                       extensions: list | None = None) -> dict | None:
    """``--resolve FILE`` pre-imports (reference ``src/resolver.h``):
    each file registers under its declared ``$id``/legacy ``id`` (via
    the compile-time mount) AND under its path relative to the
    schema's directory, so identifier-less relative ``$ref``s resolve
    (``test/validate/pass_no_identifier_ref.sh``)."""
    if not paths:
        return None
    import os

    base = os.path.dirname(os.path.abspath(schema_path))
    out: dict = {}
    expanded = []
    for p in paths:
        if os.path.isdir(p):
            exts = tuple(extensions or (".json", ".yaml", ".yml"))
            for dirpath, _dirs, names in os.walk(p):
                expanded.extend(os.path.join(dirpath, n)
                                for n in sorted(names)
                                if n.endswith(exts))
        elif not os.path.exists(p):
            from jsonschema_ray.spec.clierrors import NoSuchFileError

            raise NoSuchFileError(os.path.realpath(p))
        else:
            expanded.append(p)
    for p in expanded:
        if debug:
            print(f"debug: Detecting schema resources from file: "
                  f"{os.path.realpath(p)}", file=sys.stderr)
        try:
            doc = _load_schema_doc(p, configured=False)
        except json.JSONDecodeError as exc:
            from jsonschema_ray.spec.clierrors import JSONParseError

            raise JSONParseError(exc.lineno, exc.colno,
                                 filePath=os.path.realpath(p)) from exc
        rel = os.path.relpath(os.path.abspath(p), base)
        out[rel] = doc
        out["./" + rel] = doc
        out[f"file://{os.path.realpath(p)}"] = doc
        if debug:
            print(f"debug: Importing schema into the resolution "
                  f"context: file://{os.path.realpath(p)}",
                  file=sys.stderr)
        if isinstance(doc, dict):
            did = doc.get("$id") or doc.get("id")
            if isinstance(did, str):
                out.setdefault(did, doc)
                if debug:
                    print(f"debug: Importing schema into the "
                          f"resolution context: {did}", file=sys.stderr)
    return out


def cmd_validate(args) -> int:
    import os

    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.validate import fast_validate, validate

    # reference positional UX: `validate <schema> <instance...>` — when
    # the first positional is a schema DOCUMENT (file, any readable
    # JSON/YAML, or stdin) and no plan/dataset flags are in play, the
    # full reference single-document driver runs (spec/validate_cli.py)
    inputs = list(args.inputs or [])
    ref_mode = False
    if (not getattr(args, "schema", None)
            and not getattr(args, "instance", None)
            and getattr(args, "plan", "default") in (None, "default")
            and not getattr(args, "catalog", None) and inputs):
        first = inputs[0]
        if first == "-":
            ref_mode = True
        elif not inputs:
            ref_mode = False
        elif first.endswith((".json", ".yaml", ".yml")):
            # schema documents (even unreadable ones: the reference
            # driver owns the parse error UX)
            ref_mode = True
        elif os.path.isdir(first):
            ref_mode = True
        elif os.path.isfile(first) and not first.endswith(
                (".parquet", ".jsonl", ".gz", ".lance")):
            try:
                from jsonschema_ray.state.inputs import _read_entry

                head = _read_entry(os.path.realpath(first)).parsed()
                ref_mode = isinstance(head, (dict, bool))
            except Exception:  # noqa: BLE001 — dataset mode
                ref_mode = False
    if not inputs and not getattr(args, "schema", None) \
            and not getattr(args, "instance", None) \
            and getattr(args, "plan", "default") in (None, "default") \
            and not getattr(args, "catalog", None):
        # bare `validate` → reference positional error (exit 5)
        ref_mode = True
    if ref_mode:
        import argparse as _ap

        from jsonschema_ray.spec.clierrors import CLIArgumentError, emit
        from jsonschema_ray.spec.validate_cli import \
            run_reference_validate

        if not inputs:
            err = CLIArgumentError(
                "This command expects a path to a schema and a path to "
                "an\ninstance to validate against the schema")
            err.hint = ("For example: jsonschema validate "
                        "path/to/schema.json path/to/instance.json")
            return emit(err, json_mode=getattr(args, "json", False))
        ns = _ap.Namespace(
            schema_arg=inputs[0], instances=inputs[1:],
            as_json=getattr(args, "json", False)
            or getattr(args, "json_short", False),
            fast=getattr(args, "fast", False)
            or getattr(args, "fast_short", False),
            benchmark=getattr(args, "benchmark", False),
            trace=getattr(args, "trace", 0) == -1,
            continue_=getattr(args, "cont", False),
            loop=getattr(args, "loop", None),
            entrypoint=(getattr(args, "entrypoint", "") or
                        getattr(args, "entrypoint_short", None)) or None,
            template=getattr(args, "template", None),
            resolve=getattr(args, "resolve", None),
            default_dialect=getattr(args, "default_dialect", None),
            extension=getattr(args, "extension", None),
            ignore=getattr(args, "ignore", None),
            format_assertion=getattr(args, "format_assertion", False),
            verbose=getattr(args, "verbose", False),
            debug=getattr(args, "debug", False),
            header=getattr(args, "header", None),
            http=getattr(args, "http", False))
        return run_reference_validate(ns)

    if getattr(args, "instance", None):
        # single-instance mode — the reference's flagship UX
        # (``jsonschema validate schema.json instance.json``,
        # ``test/validate/fail_2020_12.sh``): driver-side, no Ray
        # session; errors print instance location + keyword, exit 2.
        if not args.schema:
            print("validate --instance requires --schema", file=sys.stderr)
            return EXIT_ERROR
        from jsonschema_ray.spec.jschema import compile_schema

        cs = compile_schema(
            _load_schema_doc(args.schema),
            assert_formats=True if getattr(args, "format_assertion", False)
            else None,
            entrypoint=getattr(args, "entrypoint", "") or "",
            resources=_load_resolve_docs(
                getattr(args, "resolve", None), args.schema))
        rc = EXIT_OK
        if getattr(args, "benchmark", False):
            # per-instance latency harness, overhead-compensated —
            # mirrors the reference's run_loop output contract
            # (command_validate.cc:83-133): avg +- stdev us (overhead)
            import math
            import time as _time

            loop = max(1, int(getattr(args, "loop", 1) or 1))
            for path in args.instance:
                inst = _load_schema_doc(path, configured=False)
                empty = 0.0
                for _ in range(loop):
                    t0 = _time.perf_counter_ns()
                    t1 = _time.perf_counter_ns()
                    empty += (t1 - t0) / 1000.0
                empty /= loop
                s = s2 = 0.0
                ok = True
                for _ in range(loop):
                    t0 = _time.perf_counter_ns()
                    ok = not cs.validate(inst)
                    t1 = _time.perf_counter_ns()
                    d = max(0.0, (t1 - t0) / 1000.0 - empty)
                    s += d
                    s2 += d * d
                avg = s / loop
                stdev = 0.0 if loop == 1 else \
                    math.sqrt(max(0.0, s2 / loop - avg * avg))
                print(f"{path}: {'PASS' if ok else 'FAIL'} "
                      f"{avg:.3f} +- {stdev:.3f} us ({empty:.3f})")
                if not ok:
                    rc = EXIT_VALIDATION
            return rc
        def report(label: str, errs) -> None:
            print(f"fail: {label}", file=sys.stderr)
            for p, kw, msg in errs:
                print(f"  {msg}\n    at instance location \"{p}\"\n"
                      f"    at keyword \"{kw}\"", file=sys.stderr)

        keep_going = bool(getattr(args, "cont", False))
        for path in args.instance:
            stem = path[:-3] if path.endswith(".gz") else path
            if stem.endswith((".jsonl", ".ndjson")):
                # per-ENTRY validation, reference JSONL semantics
                # (src/command_validate.cc:192-196, fail_jsonl_one.sh):
                # stop at the first failing entry unless --continue
                import gzip

                opener = gzip.open if path.endswith(".gz") else open
                entry = 0
                with opener(path, "rt", encoding="utf-8") as f:
                    for line in f:
                        if not line.strip():
                            continue
                        entry += 1
                        errs = cs.validate(json.loads(line))
                        if errs:
                            rc = EXIT_VALIDATION
                            report(f"{path} (entry #{entry})", errs)
                            if not keep_going:
                                return rc
                if rc == EXIT_OK:
                    print(f"ok: {path} ({entry} entries)", file=sys.stderr)
                continue
            inst = _load_schema_doc(path, configured=False)  # JSON or YAML
            errs = cs.validate(inst)
            if errs:
                rc = EXIT_VALIDATION
                report(path, errs)
                if not keep_going:
                    return rc
            else:
                print(f"ok: {path}", file=sys.stderr)
        return rc

    if not args.inputs:
        print("validate: need INPUT paths (or --instance files)",
              file=sys.stderr)
        return EXIT_ERROR
    _ensure_ray(args.num_cpus)
    plan = _plan_from_args(args)
    only = args.only.split(",") if args.only else None
    exclude = args.exclude.split(",") if args.exclude else None
    cat = None
    if args.catalog:
        cat = pq.read_table(args.catalog).column(
            args.catalog_key).combine_chunks()
    inputs = args.inputs
    ext, ign = getattr(args, "extension", None), getattr(args, "ignore", None)
    if not ext and not ign and inputs:
        # flags absent: fall back to a discovered jsonschema.json
        # project config's extension/ignore (configuration.markdown)
        from jsonschema_ray.state.config import discover

        cfg = discover(inputs[0])
        if cfg and (cfg.get("extension") or cfg.get("ignore")):
            ext, ign = cfg.get("extension"), cfg.get("ignore")
    if ext or ign:
        # reference traversal filters (src/input.h parse_extensions /
        # parse_ignore); without the flags, directories pass through so
        # parquet directory reads keep working
        from jsonschema_ray.state.manifest import scan_inputs

        inputs = scan_inputs(inputs, extensions=ext, ignore=ign)
        if not inputs:
            print("validate: no inputs left after extension/ignore "
                  "filters", file=sys.stderr)
            return EXIT_ERROR
    if getattr(args, "checked", False):
        # position-tracked parse first: the reference prints
        # path:line:col for malformed input and stops before validating
        from jsonschema_ray.sources.readers import JsonlCheckedSource

        checked = JsonlCheckedSource(inputs)
        perrs = sorted(checked.errors().take_all(),
                       key=lambda e: (e["path"], e["line"], e["col"]))
        if perrs:
            for e in perrs:
                print(f"{e['path']}:{e['line']}:{e['col']}: "
                      f"{e['message']}", file=sys.stderr)
            return EXIT_ERROR
        src = checked
    else:
        src = _input_source(inputs)
    if getattr(args, "trace", 0):
        # annotation/trace rows for the first N docs (the --trace analog,
        # reference output_simple.cc:83-93) — driver-side by design
        import pyarrow as pa

        from jsonschema_ray.spec.compile import CompiledRowChecker

        head = pa.concat_tables([
            b for b in src.dataset().limit(args.trace)
            .iter_batches(batch_format="pyarrow")])
        checker = CompiledRowChecker(
            plan.filtered(only=only, exclude=exclude), catalog_keys=cat)
        for row in checker.trace(head).to_pylist():
            print(f"{row['doc_id']}\t{row['rule_id']}\t"
                  f"{row['span_index']}\t{row['outcome']}", file=sys.stderr)
    if args.fast:
        # --only/--exclude must bind in fast mode too, not silently drop
        fplan = plan.filtered(only=only, exclude=exclude)
        out = fast_validate(src, fplan, catalog_keys=cat)
        print(json.dumps(out))
        return EXIT_OK if out["passed"] else EXIT_VALIDATION
    res = validate(src, plan, catalog_keys=cat, only=only, exclude=exclude)
    if getattr(args, "fail_fast", False):
        # streaming early-exit (the reference's default fail-fast vs
        # our exhaustive default, SURVEY §2.7): Dataset.limit() stops
        # upstream execution once the first rows materialize, so a
        # corrupt input fails in seconds instead of a full scan
        head = res.violations.limit(args.limit).to_pandas()
        if len(head):
            for r in head.itertuples(index=False):
                print(f"{r.doc_id}\t{r.rule_id}\t{r.span_index}\t"
                      f"{r.message}", file=sys.stderr)
            print(f"fail-fast: violations found (showing ≤{args.limit})",
                  file=sys.stderr)
            return EXIT_VALIDATION
        print("ok (fail-fast scan: no violations)", file=sys.stderr)
        return EXIT_OK
    res.materialize()
    n = res.violation_count()
    if args.json:
        # Standard/Basic-style structured output
        # (/root/reference/vendor/blaze/src/output/output_standard.cc:47-135).
        # Only the first --limit rows reach the driver (distributed
        # sort + limit); the full set goes to --out parquet.
        rows = res.sorted_head(args.limit).to_pylist()
        print(json.dumps({
            "valid": res.overall_pass(),
            "violations": [
                {"doc_id": r["doc_id"], "rule_id": r["rule_id"],
                 "span_index": r["span_index"], "message": r["message"]}
                for r in rows],
            "total_violations": n,
            "plan_hash": plan.plan_hash(),
        }, indent=1))
        if args.out:
            res.violations.write_parquet(args.out)
        return res.exit_code()
    if args.out:
        res.violations.write_parquet(args.out)
    else:
        for row in res.sorted_head(args.limit).to_pylist():
            print(f"{row['doc_id']}\t{row['rule_id']}\t"
                  f"{row['span_index']}\t{row['message']}", file=sys.stderr)
    verdicts = res.partition_verdicts()
    failed_parts = verdicts.num_rows - sum(verdicts.column("passed").to_pylist())
    print(json.dumps({"violations": n, "failed_partitions": failed_parts,
                      "partitions": verdicts.num_rows,
                      "plan_hash": plan.plan_hash()}))
    return res.exit_code()


def cmd_run(args) -> int:
    """Checkpointed, resumable validation (the ``ray job submit``
    entrypoint): shards the input, writes per-shard violations +
    lineage manifests, and skips shards already committed under the
    same plan hash (state/manifest.py)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.run import run_checkpointed

    _ensure_ray(args.num_cpus)
    plan = _plan_from_args(args)
    cat = None
    if args.catalog:
        cat = pq.read_table(args.catalog).column(
            args.catalog_key).combine_chunks()
    files: list[str] = []
    for pattern in args.inputs:
        matched = sorted(_glob.glob(pattern))
        files.extend(matched if matched else [pattern])
    out = run_checkpointed(files, args.out, plan, catalog_keys=cat,
                           shard_size=args.shard_size)
    print(json.dumps(out))
    return EXIT_OK if out["passed"] else EXIT_VALIDATION


CURATE_OPS = ("gopher", "token-count", "bpe-count", "quality",
              "normalize", "redact", "langid", "repetition")


def cmd_curate(args) -> int:
    """``jsonschema curate`` — run a map-family curation operator
    (Gopher rules, token counts, normalization, redaction, langid,
    repetition suite) over parquet inputs with RESUMABLE sharded
    output: per-shard parquet + lineage manifests via
    ``run_transform_checkpointed``; re-running skips committed shards
    with the same (op, params) fingerprint."""
    import glob as _glob

    from jsonschema_ray.pipelines.run import run_transform_checkpointed

    _ensure_ray(args.num_cpus)
    key, text = args.key_col, args.text_col
    op = args.op

    def transform(src):
        import pyarrow as _pa

        from jsonschema_ray.pipelines import textops as T

        ds = src.dataset(columns=[key, text])
        if op == "gopher":
            return ds.map_batches(
                lambda t: T.add_gopher_flags(t, text_col=text)
                .drop_columns([text]), batch_format="pyarrow")
        if op == "token-count":
            return ds.map_batches(
                lambda t: T.add_token_count(t, text_col=text)
                .drop_columns([text]), batch_format="pyarrow")
        if op == "bpe-count":
            from jsonschema_ray.pipelines.queries import BPE_PRETOKEN_RE

            def bpe(t: _pa.Table) -> _pa.Table:
                import pyarrow.compute as _pc
                col = t.column(text)
                if isinstance(col, _pa.ChunkedArray):
                    col = col.combine_chunks()
                return _pa.table({
                    key: t.column(key),
                    "n_bpe_pretokens": _pc.count_substring_regex(
                        col.fill_null(""), BPE_PRETOKEN_RE)
                    .cast(_pa.int64())})
            return ds.map_batches(bpe, batch_format="pyarrow")
        if op == "quality":
            return ds.map_batches(
                lambda t: T.add_quality(t, text_col=text)
                .drop_columns([text]), batch_format="pyarrow")
        if op == "normalize":
            from jsonschema_ray.pipelines.queries import q_normalize_text  # noqa: F401
            import pyarrow.compute as _pc

            def norm(t: _pa.Table) -> _pa.Table:
                col = t.column(text)
                if isinstance(col, _pa.ChunkedArray):
                    col = col.combine_chunks()
                n = _pc.utf8_trim_whitespace(_pc.replace_substring_regex(
                    _pc.utf8_lower(_pc.utf8_normalize(col.fill_null(""),
                                                      form="NFC")),
                    r"\s+", " "))
                return _pa.table({key: t.column(key), "norm_text": n})
            return ds.map_batches(norm, batch_format="pyarrow")
        if op == "redact":
            from jsonschema_ray.pipelines.textops import redact_text
            return redact_text(src, key, text_col=text)
        if op == "langid":
            return ds.map_batches(
                lambda t: T.add_langid(t, text_col=text)
                .drop_columns([text]), batch_format="pyarrow")
        if op == "repetition":
            return T.repetition_suite(src, key_col=key, text_col=text)
        raise SystemExit(f"unknown op: {op}")

    files: list[str] = []
    for pattern in args.inputs:
        matched = sorted(_glob.glob(pattern))
        files.extend(matched if matched else [pattern])
    fp = f"curate/{op}/v1/key={key}/text={text}"
    out = run_transform_checkpointed(files, args.out, transform,
                                     fingerprint=fp,
                                     shard_size=args.shard_size)
    print(json.dumps({"op": op, **out}))
    return EXIT_OK


def cmd_metaschema(args) -> int:
    """``jsonschema metaschema`` — validate schemas against their own
    dialect's metaschema with the reference's exact failure output
    (``src/command_metaschema.cc`` + the explaining evaluator in
    spec/describe.py): per-file ``fail:`` blocks with messages,
    instance positions and evaluate paths; ``--json`` emits the
    Standard Basic document per input. ``--plan`` instead self-checks a
    CheckPlan artifact (this engine's own format)."""
    if getattr(args, "plan", None) or getattr(args, "schema", None):
        return _metaschema_plan(args)

    import os

    from jsonschema_ray.spec.clierrors import (CLIError, NotSchemaError,
                                               emit,
                                               validate_http_headers)
    from jsonschema_ray.spec.describe import (ExplainError,
                                              explain_against_metaschema)
    from jsonschema_ray.state.inputs import WalkOptions, walk_inputs

    json_mode = getattr(args, "as_json", False)
    result = True
    try:
        validate_http_headers(getattr(args, "header", None))
        entries = walk_inputs(
            list(getattr(args, "paths", None) or []),
            WalkOptions(extensions=getattr(args, "extension", None),
                        ignores=getattr(args, "ignore", None),
                        verbose=args.verbose, debug=args.debug))
        for entry in entries:
            doc = entry.parsed()
            if not isinstance(doc, (dict, bool)):
                raise NotSchemaError(entry.path)
            dd = getattr(args, "default_dialect", None)
            if not dd and entry.config:
                from jsonschema_ray.state.config import apply_to_schema

                dd = apply_to_schema({}, entry.config, entry.path
                                     ).get("$schema")
            dialect = doc.get("$schema") if isinstance(doc, dict) \
                else None
            dialect = dialect if isinstance(dialect, str) else dd
            if not dialect:
                from jsonschema_ray.spec.clierrors import \
                    SchemaUnknownBaseDialectError

                raise SchemaUnknownBaseDialectError(filePath=entry.path)
            if "://" not in dialect:
                from jsonschema_ray.spec.clierrors import \
                    SchemaRelativeMetaschemaError

                raise SchemaRelativeMetaschemaError(
                    dialect, filePath=entry.path)

            resources = dict(_load_resolve_docs(
                getattr(args, "resolve", None) or [], entry.path) or {})
            # pre-imported metaschemas carry the same frame strictness
            # the reference applies (anchor collisions, bad $ids,
            # invalid ref targets), with THEIR file as the context
            for rp in getattr(args, "resolve", None) or []:
                if not os.path.isfile(rp):
                    continue
                from jsonschema_ray.spec.jschema import compile_schema
                from jsonschema_ray.state.inputs import _read_entry

                rentry = _read_entry(os.path.realpath(rp))
                try:
                    compile_schema(rentry.parsed())
                except CLIError as rerr:
                    from types import SimpleNamespace

                    from jsonschema_ray.spec.clierrors import \
                        SchemaReferenceError

                    if isinstance(rerr, SchemaReferenceError):
                        # frame-reference failures attribute to the
                        # SCHEMA under validation, with the resolved
                        # identifier qualified by the metaschema's id
                        rdoc = rentry.doc
                        rid = (rdoc.get("$id") or rdoc.get("id") or ""
                               ) if isinstance(rdoc, dict) else ""
                        ident = rerr.fields.get("identifier", "")
                        if not ident.startswith("#"):
                            # already absolute (the compile layer
                            # qualifies when it knows the base)
                            rid = ""
                        qual = SchemaReferenceError(
                            f"{rid.rstrip('#')}{ident}",
                            rerr.fields.get("location", ""),
                            filePath=entry.path)
                        qual.hint = rerr.hint
                        raise qual from rerr
                    raise _stamp_fmt_error(
                        rerr, SimpleNamespace(
                            text=rentry.text, path=rentry.path)) from rerr
            for r_uri, r_target in ((entry.config or {}).get("resolve")
                                    or {}).items():
                tfile = r_target.replace("file://", "", 1)
                if os.path.isfile(tfile):
                    try:
                        resources[r_uri.rstrip("#")] = _load_schema_doc(
                            tfile, configured=False)
                    except Exception:   # noqa: BLE001 — broken remap
                        pass
            _collect_embedded_resources(doc, resources)
            trace_mode = getattr(args, "trace", False)
            try:
                from jsonschema_ray.spec.describe import Explainer

                ex = Explainer(resources,
                               assert_formats=getattr(
                                   args, "format_assertion", False))
                meta = ex._resolve(dialect)
                mbase = (meta.get("$id") or meta.get("id") or dialect
                         ).rstrip("#")
                ok, errs = ex.validate(meta, doc, mbase,
                                       trace=trace_mode)
                tevents = ex._trace if trace_mode else None
            except ExplainError as exc:
                from jsonschema_ray.spec.clierrors import \
                    SchemaResolutionError

                raise SchemaResolutionError(
                    dialect, filePath=entry.path) from exc

            from jsonschema_ray.spec.positions import (
                pointer_positions, yaml_pointer_positions)

            try:
                spans = yaml_pointer_positions(entry.text) if entry.yaml \
                    else pointer_positions(entry.text)
            except Exception:   # noqa: BLE001 — positions best-effort
                spans = {}

            if trace_mode:
                sys.stdout.write(_render_trace(tevents, spans, dialect))
                if not ok:
                    result = False
            elif json_mode:
                print(entry.path, file=sys.stderr)
                from jsonschema_ray.spec.format import prettify_json

                obj = {"valid": ok}
                if ok:
                    annos = ex.annotations()
                    for a in annos:
                        span = spans.get(a["instanceLocation"])
                        if span:
                            a["instancePosition"] = list(span)
                        a["annotation"] = a.pop("annotation")
                    if annos:
                        obj["annotations"] = [
                            {"keywordLocation": a["keywordLocation"],
                             "absoluteKeywordLocation":
                                 a["absoluteKeywordLocation"],
                             "instanceLocation": a["instanceLocation"],
                             **({"instancePosition":
                                 a["instancePosition"]}
                                if "instancePosition" in a else {}),
                             "annotation": a["annotation"]}
                            for a in annos]
                else:
                    obj["errors"] = [_std_error(e, spans) for e in errs]
                print(prettify_json(obj))
                if not ok:
                    result = False
            elif ok:
                if args.verbose or args.debug:
                    print(f"ok: {entry.path}\n  matches {dialect}",
                          file=sys.stderr)
            else:
                print(f"fail: {entry.path}", file=sys.stderr)
                sys.stderr.write(_render_failure(errs, spans))
                result = False
    except CLIError as err:
        return emit(err, json_mode=json_mode)
    return EXIT_OK if result else EXIT_VALIDATION


def _collect_embedded_resources(doc, resources: dict) -> None:
    """Register every $id-bearing subtree so a document's own embedded
    metaschema resolves (pass_bundled_metaschema.sh)."""
    if isinstance(doc, dict):
        did = doc.get("$id")
        if isinstance(did, str) and "://" in did:
            resources.setdefault(did.rstrip("#"), doc)
        for v in doc.values():
            _collect_embedded_resources(v, resources)
    elif isinstance(doc, list):
        for v in doc:
            _collect_embedded_resources(v, resources)


def _render_failure(errs, spans) -> str:
    """The reference's SimpleOutput text block (src/utils.h print)."""
    out = "error: Schema validation failure\n"
    for e in errs:
        out += f"  {e.message}\n"
        out += f'    at instance location "{e.instance_location}"'
        span = spans.get(e.instance_location)
        if span:
            out += f" (line {span[0]}, column {span[1]})"
        out += "\n"
        out += f'    at evaluate path "{e.evaluate_path}"\n'
    return out


# 2019-09+/2020-12 keyword → vocabulary-name map (the trace's
# "at vocabulary" attribution; earlier dialects attribute every keyword
# to the dialect URI itself — metaschema pass_trace.sh draft-04)
_KW_VOCAB = {
    **{k: "core" for k in (
        "$schema", "$id", "$ref", "$defs", "$comment", "$anchor",
        "$dynamicAnchor", "$dynamicRef", "$recursiveRef",
        "$recursiveAnchor", "$vocabulary")},
    **{k: "applicator" for k in (
        "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
        "dependentSchemas", "prefixItems", "items", "additionalItems",
        "contains", "properties", "patternProperties",
        "additionalProperties", "propertyNames")},
    **{k: "validation" for k in (
        "type", "enum", "const", "multipleOf", "maximum",
        "exclusiveMaximum", "minimum", "exclusiveMinimum", "maxLength",
        "minLength", "pattern", "maxItems", "minItems", "uniqueItems",
        "maxContains", "minContains", "maxProperties", "minProperties",
        "required", "dependentRequired")},
    **{k: "meta-data" for k in (
        "title", "description", "default", "deprecated", "readOnly",
        "writeOnly", "examples")},
    **{k: "unevaluated" for k in (
        "unevaluatedItems", "unevaluatedProperties")},
    **{k: "content" for k in (
        "contentEncoding", "contentMediaType", "contentSchema")},
    "format": "format-annotation",
}


def _trace_vocab(ep: str, dialect: str) -> str:
    d = (dialect or "").rstrip("#")
    era = "2020-12" if "2020-12" in d else (
        "2019-09" if "2019-09" in d else None)
    if era is None:
        return dialect
    kw = ep.rsplit("/", 1)[-1].replace("~1", "/").replace("~0", "~")
    group = _KW_VOCAB.get(kw)
    if group is None:
        return "<unknown>"
    if era == "2019-09" and group == "format-annotation":
        group = "format"
    return f"https://json-schema.org/draft/{era}/vocab/{group}"


def _render_trace(events, spans, dialect: str) -> str:
    """The reference's --trace stream (output_trace.cc): one block per
    instruction push/pass/fail/annotation with positions and
    keyword/vocabulary locations."""
    from jsonschema_ray.spec.format import prettify_json

    blocks = []
    for kind, ep, iptr, name, absloc, value in events:
        arrow = "@-" if kind == "annotation" else (
            "->" if kind == "push" else "<-")
        b = f'{arrow} ({kind}) "{ep}" ({name})\n'
        if kind == "annotation":
            b += f"   value {prettify_json(value)}\n"
        b += f'   at instance location "{iptr}"'
        span = spans.get(iptr)
        if span:
            b += f" (line {span[0]}, column {span[1]})"
        b += "\n"
        b += f'   at keyword location "{absloc}"\n'
        b += f'   at vocabulary "{_trace_vocab(ep, dialect)}"\n'
        blocks.append(b)
    return "\n".join(blocks)


def _std_error(e, spans) -> dict:
    obj = {"keywordLocation": e.evaluate_path,
           "absoluteKeywordLocation": e.schema_location,
           "instanceLocation": e.instance_location}
    span = spans.get(e.instance_location)
    if span:
        obj["instancePosition"] = list(span)
    obj["error"] = e.message
    return obj


def _metaschema_plan(args) -> int:
    """Plan self-check (the ``jsonschema metaschema`` analog: validate
    the schema artifact itself): structural validation + compile every
    kernel + cross-check compiled kernels against the independent
    Python evaluator on a synthetic probe table. With ``--schema``, a
    JSON Schema DOCUMENT is validated against the embedded self-hosted
    metaschema instead (``src/command_metaschema.cc`` analog)."""
    if getattr(args, "schema", None):
        from jsonschema_ray.spec.jschema import check_metaschema

        errs = check_metaschema(_load_schema_doc(args.schema))
        for p, kw, msg in errs:
            print(f"metaschema: {p or '/'}: {kw}: {msg}", file=sys.stderr)
        return EXIT_VALIDATION if errs else EXIT_OK

    import numpy as np
    import pyarrow as pa

    from jsonschema_ray.spec.plan import CheckPlan
    from jsonschema_ray.spec.predicates import (
        compile_predicate, evaluate_predicate_python)

    try:
        plan = _load_plan(args.plan)
    except (KeyError, ValueError, json.JSONDecodeError) as e:
        print(f"metaschema: structural error: {e}", file=sys.stderr)
        return EXIT_VALIDATION

    errors = []
    fields: set[str] = set()

    def walk(spec):
        if not isinstance(spec, dict) or "op" not in spec:
            errors.append(f"predicate is not an op dict: {spec!r}")
            return
        if "field" in spec:
            fields.add(spec["field"])
        for key in ("arg", "cond", "then", "else"):
            if key in spec:
                walk(spec[key])
        for s in spec.get("args", []):
            walk(s)

    preds = []
    for r in plan.rules:
        if r.kind == "predicate":
            if r.check is None:
                errors.append(f"{r.rule_id}: predicate rule without check")
                continue
            walk(r.check)
            if r.when:
                walk(r.when)
            preds.append((r.rule_id, r.check))
        elif r.kind in ("unique", "ref", "unique_items", "contains",
                        "stats", "drift", "json_schema"):
            needed = {"unique": "key", "ref": "field",
                      "unique_items": "field", "contains": "predicate",
                      "stats": "column", "drift": "column",
                      "json_schema": "field"}[r.kind]
            if needed not in r.params:
                errors.append(f"{r.rule_id}: {r.kind} rule missing param {needed!r}")
            if r.kind == "contains" and "predicate" in r.params:
                walk(r.params["predicate"])
                preds.append((r.rule_id, r.params["predicate"]))

    # probe table: strings with nulls + ints + floats for every field
    rng = np.random.default_rng(7)
    n = 64
    cols: dict[str, Any] = {}
    for f in fields or {"x"}:
        strs = [None, "", "abc", "media://0123456789abcdef", "text"] * (n // 5 + 1)
        cols[f] = pa.array(strs[:n], type=pa.string())
    probe_s = pa.table(cols)
    cols_n = {f: pa.array(rng.integers(-5, 50, n), type=pa.int64())
              for f in fields or {"x"}}
    probe_n = pa.table(cols_n)

    for rule_id, spec in preds:
        for probe in (probe_s, probe_n):
            try:
                kernel = compile_predicate(spec)
                got = kernel(probe)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError):
                continue  # type-incompatible probe — fine
            except ValueError as e:
                errors.append(f"{rule_id}: does not compile: {e}")
                break
            rows = probe.to_pylist()
            want = [evaluate_predicate_python(spec, row) for row in rows]
            if got.tolist() != want:
                errors.append(f"{rule_id}: kernel/evaluator divergence on probe")
    if errors:
        for e in errors:
            print(f"metaschema: {e}", file=sys.stderr)
        return EXIT_VALIDATION
    print(f"ok: {len(plan.rules)} rules, plan_hash {plan.plan_hash()}")
    return EXIT_OK


def cmd_upgrade(args) -> int:
    """``jsonschema upgrade`` — dialect migration
    (``src/command_upgrade.cc``): positional schema file or ``-``,
    ``--to draft4|draft6|draft7|2019-09|2020-12`` (default 2020-12),
    chained alterschema rule sets, canonical-format + prettified output
    to stdout. Draft 1/2 sources are unsupported (exit 3); custom
    metaschemas cannot be upgraded in place (exit 4). ``--plan PATH``
    instead migrates a legacy CheckPlan document (this engine's own
    artifact)."""
    from jsonschema_ray.spec.clierrors import (CLIArgumentError, CLIError,
                                               CustomMetaschemaUpgradeError,
                                               NoSuchFileError,
                                               NotSchemaError,
                                               OptionEnumerationError,
                                               SchemaUnknownBaseDialectError,
                                               UnsupportedDialectUpgradeError,
                                               emit, validate_http_headers)

    if getattr(args, "plan", None):
        return _upgrade_plan(args)

    import os

    from jsonschema_ray.spec.alterschema import _TARGET_VER, upgrade_schema
    from jsonschema_ray.spec.format import prettify_schema

    json_mode = getattr(args, "as_json", False)
    try:
        validate_http_headers(getattr(args, "header", None))
        to = getattr(args, "to", None) or "2020-12"
        if to not in _TARGET_VER:
            raise OptionEnumerationError(
                "The given target dialect is not supported", "to",
                sorted(_TARGET_VER, key=_TARGET_VER.get))
        if not getattr(args, "schema_pos", None):
            err = CLIArgumentError("This command expects a path to a "
                                   "schema")
            err.hint = ("For example: jsonschema upgrade "
                        "path/to/schema.json")
            raise err

        if args.schema_pos == "-":
            display = "/dev/stdin"
            raw_text = sys.stdin.read()
            from jsonschema_ray.state.inputs import _parse_text

            doc, _yaml = _parse_text(raw_text, display, "")
            cfg = None
        else:
            path = os.path.abspath(args.schema_pos)
            display = os.path.realpath(path)
            if not os.path.exists(path):
                raise NoSuchFileError(display)
            if os.path.isdir(path):
                from jsonschema_ray.spec.clierrors import \
                    InputIsADirectoryError

                raise InputIsADirectoryError(display)
            from jsonschema_ray.state.inputs import _read_entry

            entry = _read_entry(display)
            raw_text = entry.text
            doc = entry.parsed()
            from jsonschema_ray.state.config import discover

            cfg = discover(os.path.dirname(path))
        if not isinstance(doc, (dict, bool)):
            raise NotSchemaError(display)

        dd = getattr(args, "default_dialect", None) \
            or (cfg or {}).get("defaultDialect")
        if isinstance(doc, dict) and "$schema" not in doc and dd:
            doc = {"$schema": dd, **doc}

        # dialect gating over every schema resource of the document
        # (command_upgrade.cc:139-193: frame locations checked for
        # upgradable + known dialects before any transform)
        def check_dialects(node, ptr):
            if isinstance(node, dict):
                ds = node.get("$schema")
                if isinstance(ds, str):
                    known = ("2020-12", "2019-09", "draft-07", "draft-06",
                             "draft-04", "draft-03")
                    legacy12 = ("draft-00", "draft-01", "draft-02")
                    fields = {"line": None, "column": None,
                              "filePath": display, "location": ptr,
                              "uri": ds}
                    try:
                        from jsonschema_ray.spec.positions import \
                            pointer_positions

                        pos = pointer_positions(raw_text).get(ptr)
                        if pos:
                            fields["line"], fields["column"] = pos[:2]
                    except Exception:   # noqa: BLE001 — best effort
                        pass
                    if any(tag in ds for tag in legacy12):
                        raise UnsupportedDialectUpgradeError(**fields)
                    if not any(tag in ds for tag in known):
                        raise CustomMetaschemaUpgradeError(**fields)
                for k, v in node.items():
                    esc = k.replace("~", "~0").replace("/", "~1")
                    check_dialects(v, f"{ptr}/{esc}")
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    check_dialects(v, f"{ptr}/{i}")

        if isinstance(doc, dict):
            if "$schema" not in doc:
                raise SchemaUnknownBaseDialectError(filePath=display)
            check_dialects(doc, "")
        upgraded = upgrade_schema(doc, to=to,
                                  meta=getattr(args, "meta", False)) \
            if isinstance(doc, dict) else doc
        out = prettify_schema(upgraded) if isinstance(upgraded, dict) \
            else json.dumps(upgraded) + "\n"
    except CLIError as err:
        return emit(err, json_mode=json_mode)
    if getattr(args, "output", None):
        with open(args.output, "w") as f:
            f.write(out)
    else:
        sys.stdout.write(out)
    return EXIT_OK


def _upgrade_plan(args) -> int:
    """Legacy CheckPlan document migration (``upgrade --plan``)."""
    from jsonschema_ray.spec.plan import PLAN_VERSION, CheckPlan, Rule

    with open(args.plan) as f:
        doc = json.load(f)

    version = doc.get("version", 0)
    if version > PLAN_VERSION:
        print(f"upgrade: plan version {version} is newer than engine "
              f"({PLAN_VERSION})", file=sys.stderr)
        return EXIT_ERROR
    rules_raw = doc.get("rules", [])
    if isinstance(rules_raw, dict):  # v0 bare map form: {rule_id: predicate}
        rules_raw = [{"rule_id": k, "check": v} for k, v in rules_raw.items()]
    rules = []
    for r in rules_raw:
        r = dict(r)
        if "assert" in r and "check" not in r:  # v0 keyword
            r["check"] = r.pop("assert")
        rules.append(Rule.from_json(r))
    plan = CheckPlan(rules=rules, mode=doc.get("mode", "exhaustive"))
    out = json.dumps(plan.to_json(), indent=2, sort_keys=True) + "\n"
    target = args.output or args.plan
    with open(target, "w") as f:
        f.write(out)
    print(f"upgraded v{version} → v{PLAN_VERSION}: {len(rules)} rules, "
          f"plan_hash {plan.plan_hash()}", file=sys.stderr)
    return EXIT_OK


def cmd_fmt(args) -> int:
    """``jsonschema fmt`` — reference-parity canonical formatting
    (``src/command_fmt.cc``): positionals are schema files, directories,
    or ``-`` (stdin); none → config-path/cwd recursive walk. Keyword
    ranking per ``vendor/blaze/src/format/format.cc:14-136``;
    ``--keep-ordering`` prettifies without reordering; ``--check``
    verifies without writing (exit 2 + fix hint on failure, JSON
    verdict under ``--json``); rewrites are skipped when already
    canonical (mtime intact). ``--plan PATH`` instead formats a
    CheckPlan rules file (this engine's own artifact)."""
    from jsonschema_ray.spec.clierrors import (CLIError,
                                               YAMLNotSupportedError,
                                               emit)

    if getattr(args, "plan", None):
        with open(args.plan) as f:
            raw = f.read()
        plan = _load_plan(args.plan)
        canonical = json.dumps(plan.to_json(), indent=2,
                               sort_keys=True) + "\n"
        if args.check:
            if raw != canonical:
                print(f"{args.plan}: not canonically formatted",
                      file=sys.stderr)
                return EXIT_VALIDATION
            return EXIT_OK
        with open(args.plan, "w") as f:
            f.write(canonical)
        return EXIT_OK

    from jsonschema_ray.spec.format import (looks_like_test_document,
                                            prettify_json,
                                            prettify_schema)
    from jsonschema_ray.state.inputs import WalkOptions, walk_inputs

    json_mode = getattr(args, "as_json", False)
    ind = int(getattr(args, "indentation", 2) or 2)
    keep = getattr(args, "keep_ordering", False)
    ok, failed = True, []

    def render(entry) -> str:
        doc = entry.parsed()
        if keep:
            return prettify_json(doc, ind) + "\n"
        dd = getattr(args, "default_dialect", None) \
            or (entry.config or {}).get("defaultDialect")
        is_test = not dd and looks_like_test_document(doc)
        if is_test:
            print(f"Interpreting as a test file: {entry.path}",
                  file=sys.stderr)
            dd = "https://json-schema.org/draft/2020-12/schema"
        elif isinstance(doc, dict) and "$schema" not in doc and not dd:
            from jsonschema_ray.spec.clierrors import \
                SchemaUnknownBaseDialectError

            raise SchemaUnknownBaseDialectError()
        else:
            # frame strictness first: anchor collisions, invalid
            # $id/$schema, unknown metaschema reject before any
            # formatting (reference exit-4 family)
            from jsonschema_ray.spec.jschema import compile_schema

            resources = _load_resolve_docs(
                getattr(args, "resolve", None) or [], entry.path)
            compile_schema(dict(doc, **({"$schema": dd} if dd and
                           "$schema" not in doc else {}))
                           if isinstance(doc, dict) else doc,
                           resources=resources)
        return prettify_schema(doc, indent=ind, default_dialect=dd)

    try:
        entries = walk_inputs(
            list(getattr(args, "paths", None) or []),
            WalkOptions(extensions=getattr(args, "extension", None),
                        ignores=getattr(args, "ignore", None),
                        verbose=args.verbose, debug=args.debug))
        for entry in entries:
            if entry.yaml:
                raise YAMLNotSupportedError(entry.path)
            if not entry.from_stdin and (args.verbose or args.debug):
                word = "Checking" if args.check else "Formatting"
                print(f"{word}: {entry.path}", file=sys.stderr)
            try:
                out = render(entry)
            except CLIError as err:
                raise _stamp_fmt_error(err, entry) from err
            if args.check:
                if entry.text == out:
                    if args.verbose:
                        print(f"ok: {entry.path}", file=sys.stderr)
                else:
                    ok = False
                    if json_mode:
                        failed.append(entry.path)
                    else:
                        print(f"fail: {entry.path}", file=sys.stderr)
            elif entry.from_stdin:
                sys.stdout.write(out)
            elif entry.text != out:
                _atomic_write(entry.path, out)
    except CLIError as err:
        return emit(err, json_mode=json_mode)

    if args.check and json_mode:
        verdict = {"valid": ok}
        if not ok:
            verdict["errors"] = failed
        from jsonschema_ray.spec.format import prettify_json as _pj

        print(_pj(verdict, ind))
    if not ok:
        if not json_mode:
            print("\nRun the `fmt` command without `--check/-c` to fix "
                  "the formatting", file=sys.stderr)
        return EXIT_VALIDATION
    return EXIT_OK


def _stamp_fmt_error(err, entry):
    """Add file/position context to a schema error the way the
    reference's per-entry catch blocks do (command_fmt.cc:88-120)."""
    from jsonschema_ray.spec.clierrors import SchemaAnchorCollisionError

    if isinstance(err, SchemaAnchorCollisionError):
        from jsonschema_ray.spec.positions import pointer_positions

        loc = err.fields.get("location", "")
        other = err.fields.get("otherLocation", "")
        line = column = None
        try:
            pos = pointer_positions(entry.text).get(loc)
            if pos:
                line, column = pos[:2]
        except Exception:   # noqa: BLE001 — positions are best-effort
            pass
        return SchemaAnchorCollisionError(
            err.fields.get("identifier", ""), line=line, column=column,
            filePath=entry.path, location=loc, otherLocation=other)
    if "filePath" not in err.fields:
        return err.with_fields(filePath=entry.path)
    return err


def _atomic_write(path: str, text: str) -> None:
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".fmt-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


_LINT_KNOWN_OPS = {
    "const", "and", "or", "not", "one_of", "if", "is_null", "not_null",
    "eq", "ne", "gt", "ge", "lt", "le", "between", "is_in", "regex",
    "regex_search", "starts_with", "ends_with", "contains", "utf8_len",
    "format", "divisible", "type",
}


def _looks_like_plan(path: str) -> bool:
    import os

    if not os.path.isfile(path):
        return False
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:   # noqa: BLE001 — not a plan; the driver decides
        return False
    return isinstance(doc, dict) and isinstance(doc.get("rules"), list) \
        and "version" in doc and "$schema" not in doc


def cmd_lint(args) -> int:
    """``jsonschema lint`` — the reference driver
    (``src/command_lint.cc`` over the blaze alterschema registry,
    ``spec/lintrules.py``); ``--plan`` (or a CheckPlan positional)
    lints this engine's own rules artifact instead."""
    plan_path = getattr(args, "plan", None)
    paths = list(getattr(args, "paths", None) or [])
    if getattr(args, "schema", None):
        paths = [args.schema] + paths
        args.paths = paths
    if plan_path is None and len(paths) == 1 \
            and _looks_like_plan(paths[0]):
        plan_path = paths[0]
    if plan_path is not None:
        args.plan = plan_path
        return _cmd_lint_plan(args)
    from jsonschema_ray.spec.lint_cli import run

    return run(args)


def _cmd_lint_plan(args) -> int:
    """CheckPlan lint: duplicate ids, unknown ops/formats, uncompilable
    regexes, unreachable rules, empty messages. ``--fix`` applies the
    mutating fixes (``transformer.cc:28-39`` analog)."""
    import re

    from jsonschema_ray.functions.formats import format_names

    plan = _load_plan(args.plan)
    findings: list[tuple[str, str, str]] = []  # (severity, rule_id, message)
    seen = set()

    def walk(rule_id, spec):
        if not isinstance(spec, dict):
            return
        op = spec.get("op")
        if op not in _LINT_KNOWN_OPS:
            findings.append(("error", rule_id, f"unknown op {op!r}"))
        if op in ("regex", "regex_search"):
            try:
                re.compile(spec.get("pattern", ""))
            except re.error as e:
                findings.append(("error", rule_id, f"bad regex: {e}"))
        if op == "format" and spec.get("format") not in format_names():
            findings.append(("error", rule_id,
                             f"unknown format {spec.get('format')!r}"))
        if op == "const" and spec.get("value") is False:
            findings.append(("warning", rule_id, "constant-false predicate"))
        if op == "is_in":
            vals = spec.get("values", [])
            if not vals:
                findings.append(("warning", rule_id,
                                 "empty is_in value set (always false)"))
            elif len(vals) != len(set(map(repr, vals))):
                # duplicate_enum_values analog (alterschema/common)
                findings.append(("warning", rule_id,
                                 "duplicate values in is_in set"))
        if op in ("between", "utf8_len"):
            lo, hi = spec.get("min"), spec.get("max")
            if lo is not None and hi is not None and lo > hi:
                findings.append(("error", rule_id,
                                 f"unsatisfiable bounds: min {lo} > max {hi}"))
        for key in ("arg", "cond", "then", "else"):
            if key in spec:
                walk(rule_id, spec[key])
        for s in spec.get("args", []):
            walk(rule_id, s)

    for r in plan.rules:
        if r.rule_id in seen:
            findings.append(("error", r.rule_id, "duplicate rule_id"))
        seen.add(r.rule_id)
        if not r.message:
            findings.append(("warning", r.rule_id, "empty message"))
        if r.when and r.when.get("op") == "const" and not r.when.get("value"):
            findings.append(("warning", r.rule_id,
                             "when=const false: rule is unreachable"))
        if r.kind == "predicate":
            walk(r.rule_id, r.check or {})
            if r.when:
                walk(r.rule_id, r.when)

    for sev, rid, msg in findings:
        print(f"{sev}: {rid}: {msg}", file=sys.stderr)
    bad_rules = {rid for sev, rid, _ in findings if sev == "error"}
    health = 100.0 * (1 - len(bad_rules) / max(1, len(plan.rules)))
    print(json.dumps({"rules": len(plan.rules), "findings": len(findings),
                      "health": round(health, 1)}))

    if args.fix and findings:
        # mutating fixes: drop unreachable rules, fill empty messages
        new_rules = []
        for r in plan.rules:
            if r.when and r.when.get("op") == "const" and not r.when.get("value"):
                continue
            if not r.message:
                r.message = f"rule {r.rule_id} failed"
            new_rules.append(r)
        plan.rules = new_rules
        with open(args.plan, "w") as f:
            f.write(json.dumps(plan.to_json(), indent=2, sort_keys=True) + "\n")
        # error-severity findings (unknown op, bad regex, unsatisfiable
        # bounds) are NOT fixable by the mutations above — the plan is
        # still broken, so the exit code must say so.
        fixed_ids = {r.rule_id for r in plan.rules}
        remaining = {rid for sev, rid, _ in findings
                     if sev == "error" and rid in fixed_ids}
        return EXIT_VALIDATION if remaining else EXIT_OK
    return EXIT_VALIDATION if bad_rules else EXIT_OK


def _run_schema_test_document(args, suite) -> int:
    """Reference test-document runner: compile the `target` schema once
    (relative path against the test file, or a URI via --resolve) and
    check every case's verdict, plus expanded-JSON-LD equality for
    cases carrying `rdf` (src/command_test.cc:83-300)."""
    import os

    from jsonschema_ray.spec.jschema import compile_schema
    from jsonschema_ray.spec.testdoc import (TestDocumentError,
                                             run_test_document)

    base_dir = os.path.dirname(os.path.abspath(args.suite))
    resources: dict = {}
    for r in getattr(args, "resolve", None) or []:
        paths = [r]
        if os.path.isdir(r):
            paths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(r)
                for n in ns if n.endswith((".json", ".yaml", ".yml")))
        for p in paths:
            doc = _load_schema_doc(os.path.abspath(p))
            resources[f"file://{os.path.abspath(p)}"] = doc
            resources[os.path.abspath(p)] = doc
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    resources.setdefault(did, doc)
    target_doc: list = [None]

    def compile_target(target: str):
        if "://" in target:
            doc = resources.get(target)
            if doc is None:
                raise ValueError(
                    f"could not resolve the test target: {target!r}")
        else:
            doc = _load_schema_doc(
                os.path.normpath(os.path.join(base_dir, target)))
        target_doc[0] = doc
        return compile_schema(doc, resources=resources or None)

    def load_data_path(p: str):
        with open(os.path.normpath(os.path.join(base_dir, p))) as f:
            return json.load(f)

    try:
        res = run_test_document(
            suite, compile_target=compile_target,
            load_data_path=load_data_path,
            schema_for_rdf=None)
    except TestDocumentError as e:
        print(f"{args.suite}:\nerror: {e}", file=sys.stderr)
        return EXIT_EMPTY_SUITE
    # rdf expectations need the raw schema doc; rerun the rdf-bearing
    # cases through run_test_document only if any case asks for it
    if any("rdf" in c for c in suite["tests"] if isinstance(c, dict)):
        res = run_test_document(
            suite, compile_target=compile_target,
            load_data_path=load_data_path, schema_for_rdf=target_doc[0])
    if res["failures"]:
        for idx, desc, reason in res["failures"]:
            print(f"  {idx}/{res['total']} FAIL {desc} ({reason})",
                  file=sys.stderr)
        print(f"{args.suite}: FAIL {res['passed']}/{res['total']}")
        return EXIT_VALIDATION
    print(f"{args.suite}: PASS {res['passed']}/{res['total']}")
    return EXIT_OK


def cmd_test(args) -> int:
    """Schema unit-test runner (the ``jsonschema test`` verb, SURVEY.md
    §3.2): each case supplies docs inline plus the expected verdict
    and (optionally) exact expected violation keys."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.validate import validate
    from jsonschema_ray.sources.readers import DatasetSource
    from jsonschema_ray.sources.synth import DOCS_SCHEMA

    import os as _os

    paths = list(getattr(args, "paths", None) or [])
    suite = None
    if len(paths) == 1 and _os.path.isfile(paths[0]):
        try:
            with open(paths[0]) as f:
                suite = json.load(f)
        except (OSError, json.JSONDecodeError):
            suite = None
    if not (isinstance(suite, dict) and "target" not in suite
            and isinstance(suite.get("tests"), list)
            and suite["tests"] and isinstance(suite["tests"][0], dict)
            and "docs" in suite["tests"][0]):
        # reference schema test documents through the full driver
        # (src/command_test.cc)
        from jsonschema_ray.spec.test_cli import run as _ref_test

        return _ref_test(args)
    args.suite = paths[0]
    cases = suite.get("tests", [])
    if not cases:
        print("test: empty suite", file=sys.stderr)
        return EXIT_EMPTY_SUITE
    _ensure_ray(args.num_cpus)
    plan = _load_plan(args.plan)

    passed = 0
    results = []
    for case in cases:
        table = pa.Table.from_pylist(case["docs"], schema=DOCS_SCHEMA)
        cat = case.get("catalog")
        res = validate(DatasetSource(rd.from_arrow(table)), plan,
                       catalog_keys=pa.array(cat) if cat else None,
                       num_partitions=4)
        t = res.table()
        got = sorted(zip(t.column("doc_id").to_pylist(),
                         t.column("rule_id").to_pylist(),
                         t.column("span_index").to_pylist()))
        ok = (len(got) == 0) == bool(case.get("valid", True))
        if "expected_violations" in case:
            want = sorted(tuple(v) for v in case["expected_violations"])
            ok = got == [tuple(w) for w in want]
        status = "passed" if ok else "failed"
        print(f"{'PASS' if ok else 'FAIL'} {case.get('name', '?')}: "
              f"{len(got)} violations", file=sys.stderr)
        results.append({"name": case.get("name", "?"), "status": status,
                        "violations": len(got)})
        passed += ok
    if args.report:
        # CTRF-flavoured report (the reference's --ctrf,
        # /root/reference/src/command_test.cc:328-493)
        with open(args.report, "w") as f:
            json.dump({"results": {
                "tool": {"name": "jsonschema_ray"},
                "summary": {"tests": len(cases), "passed": passed,
                            "failed": len(cases) - passed},
                "tests": results,
            }}, f, indent=1)
    print(json.dumps({"passed": passed, "total": len(cases)}))
    return EXIT_OK if passed == len(cases) else EXIT_VALIDATION


_CODEGEN_TEMPLATE = r'''"""Standalone validator generated by `jsonschema_ray codegen`.

Plan hash: {plan_hash} (version {version}). No dependency on the
engine: pure-Python row-at-a-time evaluation of the plan's row-local
rules — the portable artifact analog of the reference's codegen verb
(/root/reference/src/command_codegen.cc). Dataset-scope rules
(unique/ref/stats/drift) need the distributed engine and are listed in
SKIPPED_RULES.
"""

import re

PLAN = {plan_json}

SKIPPED_RULES = {skipped}


def _eval(spec, row):
    op = spec["op"]
    if op == "const":
        return bool(spec["value"])
    if op == "and":
        return all(_eval(s, row) for s in spec["args"])
    if op == "or":
        return any(_eval(s, row) for s in spec["args"])
    if op == "not":
        return not _eval(spec["arg"], row)
    if op == "one_of":
        return sum(_eval(s, row) for s in spec["args"]) == 1
    if op == "if":
        if _eval(spec["cond"], row):
            return _eval(spec["then"], row) if "then" in spec else True
        return _eval(spec["else"], row) if "else" in spec else True
    v = row.get(spec["field"])
    if op == "is_null":
        return v is None
    if op == "not_null":
        return v is not None
    if op == "type" and spec["type"] == "null":
        return v is None
    if v is None:
        return False
    if op == "eq":
        return v == spec["value"]
    if op == "ne":
        return v != spec["value"]
    if op == "gt":
        return v > spec["value"]
    if op == "ge":
        return v >= spec["value"]
    if op == "lt":
        return v < spec["value"]
    if op == "le":
        return v <= spec["value"]
    if op == "between":
        lo, hi = spec.get("min"), spec.get("max")
        return (lo is None or v >= lo) and (hi is None or v <= hi)
    if op == "is_in":
        # type-strict for booleans (Arrow/JSON semantics: true is not 1)
        return any(isinstance(v, bool) == isinstance(x, bool) and v == x
                   for x in spec["values"])
    if op == "regex":
        return re.fullmatch(spec["pattern"], v) is not None
    if op == "regex_search":
        return re.search(spec["pattern"], v) is not None
    if op == "starts_with":
        return v.startswith(spec["value"])
    if op == "ends_with":
        return v.endswith(spec["value"])
    if op == "contains":
        return spec["value"] in v
    if op == "utf8_len":
        lo, hi = spec.get("min"), spec.get("max")
        return (lo is None or len(v) >= lo) and (hi is None or len(v) <= hi)
    if op == "format":
        fmt = spec["format"]
        if fmt == "idn-hostname":
            return _idn_hostname_ok(v)
        if fmt == "idn-email":
            return _idn_email_ok(v)
        return re.fullmatch(FORMATS[fmt], v) is not None
    if op == "divisible":
        q = v / spec["by"]
        return abs(q - round(q)) <= 1e-9
    if op == "type":
        want = spec["type"]
        if want == "string":
            return isinstance(v, str)
        if want == "integer":
            return isinstance(v, int) and not isinstance(v, bool) or (
                not spec.get("strict") and isinstance(v, float)
                and float(v).is_integer())
        if want == "number":
            return isinstance(v, (int, float)) and not isinstance(v, bool)
        if want == "boolean":
            return isinstance(v, bool)
        if want == "array":
            return isinstance(v, list)
        if want == "object":
            return isinstance(v, dict)
    raise ValueError("unknown op: " + op)


FORMATS = {formats}


def _idn_hostname_ok(v):
    if not v or len(v) > 510:
        return False
    try:
        enc = v.rstrip(".").encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return False
    if len(enc) > 253:
        return False
    label = r"[A-Za-z0-9]([A-Za-z0-9-]{{0,61}}[A-Za-z0-9])?"
    return re.fullmatch(label + r"(\." + label + r")*\.?", enc) is not None


def _idn_email_ok(v):
    local, sep, domain = v.rpartition("@")
    if not sep or not local or not re.fullmatch(r"[^\s@]+", local):
        return False
    return _idn_hostname_ok(domain)


def validate_rows(rows):
    """rows: [{{"doc_id": str, "spans": [span_dict, ...]}}] →
    sorted violation keys [(doc_id, rule_id, span_index), ...]."""
    out = []
    for row in rows:
        doc_id, spans = row["doc_id"], row.get("spans") or []
        for rule in PLAN["rules"]:
            if not rule.get("enabled", True):
                continue
            kind = rule.get("kind", "predicate")
            if kind == "predicate" and rule.get("scope", "span") == "span":
                for i, s in enumerate(spans):
                    s = dict(s, _span_index=i)
                    if rule.get("when") and not _eval(rule["when"], s):
                        continue
                    if not _eval(rule["check"], s):
                        out.append((doc_id, rule["rule_id"], i))
            elif kind == "predicate":
                d = dict(row, n_spans=len(spans))
                if rule.get("when") and not _eval(rule["when"], d):
                    continue
                if not _eval(rule["check"], d):
                    out.append((doc_id, rule["rule_id"], -1))
            elif kind == "monotonic":
                f = rule["params"].get("field", "offset")
                strict = rule["params"].get("strict", True)
                for i in range(1, len(spans)):
                    a, b = spans[i - 1].get(f), spans[i].get(f)
                    if a is None or b is None or (b <= a if strict else b < a):
                        out.append((doc_id, rule["rule_id"], i))
            elif kind == "contains":
                n = sum(1 for s in spans if _eval(rule["params"]["predicate"], s))
                lo = rule["params"].get("min", 1)
                hi = rule["params"].get("max")
                if n < lo or (hi is not None and n > hi):
                    out.append((doc_id, rule["rule_id"], -1))
            elif kind == "unique_items":
                f = rule["params"]["field"]
                seen = set()
                for i, s in enumerate(spans):
                    v = s.get(f)
                    if v is None:
                        continue
                    if v in seen:
                        out.append((doc_id, rule["rule_id"], i))
                    seen.add(v)
    return sorted(out)


if __name__ == "__main__":
    import json, sys

    rows = json.load(sys.stdin)
    for key in validate_rows(rows):
        print("\t".join(map(str, key)))
'''


def cmd_codegen(args) -> int:
    """``jsonschema codegen`` — TypeScript type declarations from a
    schema document (``src/command_codegen.cc``; the reference's only
    target). ``--json`` wraps the code in ``{"code": ...}``. ``--plan
    PATH`` instead emits a standalone pure-Python validator module from
    a CheckPlan (this engine's own artifact)."""
    from jsonschema_ray.functions.formats import REGEX_FORMATS
    from jsonschema_ray.spec.clierrors import (CLIArgumentError, CLIError,
                                               CodegenUnsupportedError,
                                               NoSuchFileError,
                                               OptionEnumerationError,
                                               SchemaUnknownBaseDialectError,
                                               VocabularyError, emit,
                                               validate_http_headers)

    if getattr(args, "plan", None):
        plan = _load_plan(args.plan)
        row_local = {"predicate", "monotonic", "contains", "unique_items"}
        skipped = sorted(r.rule_id for r in plan.rules
                         if r.kind not in row_local)
        fmts = {name: REGEX_FORMATS[name] for name in sorted(REGEX_FORMATS)}
        code = _CODEGEN_TEMPLATE.format(
            plan_hash=plan.plan_hash(), version=plan.version,
            plan_json=repr(plan.to_json()), skipped=repr(skipped),
            formats=repr(fmts))
        if args.output:
            with open(args.output, "w") as f:
                f.write(code)
        else:
            print(code)
        return EXIT_OK

    import os

    from jsonschema_ray.spec.codegen_ts import (CodegenError,
                                                schema_to_typescript)

    json_mode = getattr(args, "as_json", False)
    try:
        if not getattr(args, "schema_pos", None):
            err = CLIArgumentError("This command expects a path to a "
                                   "schema")
            err.hint = ("For example: jsonschema codegen "
                        "path/to/schema.json --name MyType --target "
                        "typescript")
            raise err
        validate_http_headers(getattr(args, "header", None))
        target = getattr(args, "target", None)
        if not target:
            raise CLIArgumentError("You must pass a target using the "
                                   "`--target/-t` option")
        if target != "typescript":
            raise OptionEnumerationError("Unknown code generation target",
                                         "target", ["typescript"])

        path = os.path.abspath(args.schema_pos)
        display = os.path.realpath(path)
        if not os.path.exists(path):
            raise NoSuchFileError(display)
        from jsonschema_ray.state.inputs import _read_entry

        entry = _read_entry(display)
        raw_text = entry.text
        doc = entry.parsed()
        from jsonschema_ray.state.config import discover

        cfg = discover(os.path.dirname(path))
        if args.debug and cfg is not None:
            from jsonschema_ray.state.config import find_configuration

            cfgp = find_configuration(os.path.dirname(path))
            print(f"debug: Using configuration file: "
                  f"{os.path.realpath(cfgp)}", file=sys.stderr)
        dd = getattr(args, "default_dialect", None)
        if not dd and cfg:
            from jsonschema_ray.state.config import apply_to_schema

            dd = apply_to_schema({}, cfg, path).get("$schema")

        if isinstance(doc, dict) and "$schema" not in doc and not dd:
            raise SchemaUnknownBaseDialectError(filePath=display)
        ds = doc.get("$schema") if isinstance(doc, dict) else None
        ds = ds if isinstance(ds, str) else dd
        if isinstance(ds, str) and any(
                tag in ds for tag in ("draft-00", "draft-01", "draft-02",
                                      "draft-03")):
            # pre-draft-4 vocabularies have no codegen support
            raise VocabularyError(ds, filePath=display)

        registry: dict = {}
        for r in getattr(args, "resolve", None) or []:
            paths = [r]
            if os.path.isdir(r):
                paths = sorted(
                    os.path.join(dp, n) for dp, _d, ns in os.walk(r)
                    for n in ns if n.endswith((".json", ".yaml", ".yml")))
            for p in paths:
                rdoc = _load_schema_doc(os.path.abspath(p))
                registry[f"file://{os.path.abspath(p)}"] = rdoc
                if isinstance(rdoc, dict):
                    did = rdoc.get("$id") or rdoc.get("id")
                    if isinstance(did, str):
                        registry.setdefault(did, rdoc)

        def _ts_resolver(uri: str):
            rdoc = registry.get(uri)
            if rdoc is None and uri.startswith("file://"):
                try:
                    return _load_schema_doc(uri[len("file://"):])
                except OSError:
                    return None
            return rdoc

        try:
            code = schema_to_typescript(
                doc, name=getattr(args, "name", None) or "Schema",
                resolver=_ts_resolver, default_dialect=dd,
                default_id=f"file://{path}")
        except CodegenError as cge:
            if cge.keyword is not None:
                raise CodegenUnsupportedError(
                    str(cge), keyword=cge.keyword, filePath=display,
                    location=cge.pointer() or "") from cge
            raise CodegenUnsupportedError(
                str(cge), filePath=display,
                location=cge.pointer() or "") from cge
        except CLIError as err:
            from types import SimpleNamespace

            raise _stamp_fmt_error(
                err, SimpleNamespace(text=raw_text, path=display)) from err
    except CLIError as err:
        return emit(err, json_mode=json_mode)

    if json_mode:
        from jsonschema_ray.spec.format import prettify_json

        out = prettify_json({"code": code}) + "\n"
    else:
        out = code
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    else:
        sys.stdout.write(out)
    return EXIT_OK


def _resolve_dialect_file(dd: str, base_dir: str, cfg: dict | None):
    """A ``--default-dialect`` / config ``defaultDialect`` given as a
    FILE PATH resolves (trying the configured/implicit extensions) to
    ``file://<path>`` and dialects by the metaschema's own base
    (inspect pass_default_dialect_*_fallback fixtures). Returns
    (display_dialect, ver, meta_doc)."""
    import os

    if "://" in dd:
        return dd, None, None
    exts = (cfg or {}).get("extension") or []
    if isinstance(exts, str):
        exts = [exts]
    exts = [e if str(e).startswith(".") else "." + str(e)
            for e in exts] or [".json", ".yaml", ".yml"]
    for cand in [dd] + [dd + e for e in exts]:
        full = os.path.normpath(os.path.join(base_dir, cand))
        if os.path.isfile(full):
            from jsonschema_ray.spec.jschema import _dialect_ver
            from jsonschema_ray.state.inputs import _read_entry

            try:
                meta = _read_entry(os.path.realpath(full)).parsed()
            except Exception:   # noqa: BLE001 — fall through
                continue
            ver = _dialect_ver(meta) if isinstance(meta, dict) else None
            return f"file://{os.path.realpath(full)}", ver, meta
    return dd, None, None


def cmd_inspect(args) -> int:
    """``jsonschema inspect`` — the full frame dump
    (``src/command_inspect.cc``): every RESOURCE / SUBSCHEMA / POINTER
    / ANCHOR location with root/base/pointer/position/dialect/parent/
    orphan attributes plus REFERENCE edges, text or ``--json``.
    ``--plan`` instead reports a CheckPlan's rules, referenced fields,
    and per-rule Ray execution strategy (this engine's artifact)."""
    from jsonschema_ray.spec.clierrors import (CLIArgumentError, CLIError,
                                               NoSuchFileError,
                                               NotSchemaError, emit,
                                               validate_http_headers)

    if getattr(args, "plan", None):
        return _inspect_plan(args)

    import os

    from jsonschema_ray.spec.inspectframe import (frame_dump,
                                                  render_frame_json,
                                                  render_frame_text)

    json_mode = getattr(args, "as_json", False)
    try:
        validate_http_headers(getattr(args, "header", None))
        if not getattr(args, "schema_pos", None):
            err = CLIArgumentError("This command expects a path to a "
                                   "schema")
            err.hint = ("For example: jsonschema inspect "
                        "path/to/schema.json")
            raise err
        if args.schema_pos == "-":
            display = "/dev/stdin"
            from jsonschema_ray.state.inputs import read_stdin_entry

            entry = read_stdin_entry()
            cfg = None
            default_id = "file:///dev/stdin"
        else:
            path = os.path.abspath(args.schema_pos)
            display = os.path.realpath(path)
            if not os.path.exists(path):
                raise NoSuchFileError(display)
            from jsonschema_ray.state.inputs import _read_entry

            entry = _read_entry(display)
            from jsonschema_ray.state.config import discover

            cfg = discover(os.path.dirname(path))
            default_id = f"file://{display}"
        doc = entry.parsed()
        if args.debug and cfg is not None:
            from jsonschema_ray.state.config import find_configuration

            cfgp = find_configuration(os.path.dirname(path))
            print(f"debug: Using configuration file: "
                  f"{os.path.realpath(cfgp)}", file=sys.stderr)
        if not isinstance(doc, (dict, bool)):
            raise NotSchemaError(display)
        dd = getattr(args, "default_dialect", None)
        dd_base = os.getcwd()
        if not dd and cfg:
            from jsonschema_ray.state.config import apply_to_schema

            dd = (cfg or {}).get("defaultDialect")
            if dd and args.schema_pos != "-":
                gated = apply_to_schema({}, cfg, display).get("$schema")
                dd = gated
            dd_base = (cfg or {}).get("_dir") or dd_base
        dd_ver, dd_meta = None, None
        if dd:
            dd, dd_ver, dd_meta = _resolve_dialect_file(dd, dd_base, cfg)
        if isinstance(doc, dict) and "$schema" not in doc and not dd:
            from jsonschema_ray.spec.clierrors import \
                SchemaUnknownBaseDialectError

            raise SchemaUnknownBaseDialectError(filePath=display)

        # compile strictness first: anchor collisions, invalid
        # $id/$schema, unknown metaschema (reference exit-4 family);
        # identifier-less documents frame under their file identity so
        # anchor collisions report the effective base URI
        from jsonschema_ray.spec.jschema import compile_schema

        resources = _load_resolve_docs(
            getattr(args, "resolve", None) or [], display)
        probe = doc
        if isinstance(doc, dict):
            probe = dict(doc)
            if "$id" not in probe and "id" not in probe:
                probe["$id"] = default_id
            if "$schema" not in probe and dd:
                if dd_meta is not None and isinstance(dd_meta, dict) \
                        and isinstance(dd_meta.get("$id"), str):
                    probe["$schema"] = dd_meta["$id"]
                    resources = dict(resources or {})
                    resources[dd_meta["$id"]] = dd_meta
                elif "://" in dd:
                    probe["$schema"] = dd
        try:
            compile_schema(probe, resources=resources)
        except CLIError as err:
            from types import SimpleNamespace

            raise _stamp_fmt_error(
                err, SimpleNamespace(text=entry.text,
                                     path=display)) from err

        from jsonschema_ray.spec.positions import (pointer_positions,
                                                   yaml_pointer_positions)

        try:
            spans = yaml_pointer_positions(entry.text) if entry.yaml \
                else pointer_positions(entry.text)
        except Exception:   # noqa: BLE001 — spans are best-effort
            spans = {}
        locs, refs = frame_dump(doc, spans, default_dialect=dd,
                                default_id=default_id,
                                dialect_ver=dd_ver)
    except CLIError as err:
        return emit(err, json_mode=json_mode)

    if json_mode:
        from jsonschema_ray.spec.format import prettify_json

        print(prettify_json(render_frame_json(locs, refs)))
    else:
        sys.stdout.write(render_frame_text(locs, refs))
    return EXIT_OK


def _inspect_plan(args) -> int:
    """Plan frame report (``jsonschema inspect`` analog): rules, kinds,
    referenced fields, execution strategy per rule."""
    plan = _plan_from_args(args)
    rows = []
    for r in plan.rules:
        fields: set[str] = set()

        def walk(spec):
            if isinstance(spec, dict):
                if "field" in spec:
                    fields.add(spec["field"])
                for key in ("arg", "cond", "then", "else"):
                    if key in spec:
                        walk(spec[key])
                for s in spec.get("args", []):
                    walk(s)

        walk(r.check or {})
        walk(r.when or {})
        for v in r.params.values():
            if isinstance(v, str):
                fields.add(v)
        strategy = {
            "predicate": "map_batches (vectorized kernel)",
            "monotonic": "map_batches (windowed diff)",
            "contains": "map_batches (per-doc match count)",
            "unique_items": "map_batches (within-doc dedup)",
            "unique": "partial counts + groupby shuffle",
            "ref": "broadcast is_in | hash anti-join",
            "stats": "mergeable partials (tree reduce)",
            "drift": "t-digest partials vs baseline",
        }.get(r.kind, "?")
        rows.append({"rule_id": r.rule_id, "kind": r.kind, "scope": r.scope,
                     "fields": sorted(fields), "strategy": strategy,
                     "enabled": r.enabled, "severity": r.severity})
    out = {"version": plan.version, "mode": plan.mode,
           "plan_hash": plan.plan_hash(), "rules": rows}
    if getattr(args, "schema", None):
        # compile-time unevaluated* dependency analysis (the Blaze
        # unevaluated.cc pass): which occurrences are statically
        # lowerable to additional* vs need runtime annotation tracking
        from jsonschema_ray.spec.unevaluated import analyze

        entries = analyze(_load_schema_doc(args.schema))
        if entries:
            out["unevaluated"] = [e.to_json() for e in entries]
        # frame-location dump (the reference inspect verb's output,
        # src/command_inspect.cc): resources / subschemas / pointers /
        # anchors / reference edges
        import os

        from jsonschema_ray.spec.inspectframe import frame_entries

        doc = _load_schema_doc(args.schema)
        out["frame"] = frame_entries(
            doc, default_id=f"file://{os.path.abspath(args.schema)}")
    print(json.dumps(out, indent=2))
    return EXIT_OK


def _positional_error(args, message: str, example: str) -> int:
    """The reference's PositionalArgumentError contract (main.cc:1266):
    exit 5, text to stderr with the example, or ``{"error": ...}`` to
    stdout under ``--json``."""
    if getattr(args, "as_json", False):
        print(json.dumps({"error": message}, indent=2))
    else:
        print(f"error: {message}\n\nFor example: {example}",
              file=sys.stderr)
    return EXIT_ARGS


def _jsonl_entries(path: str):
    with open(path) as f:
        for line in f:
            if line.strip():
                yield json.loads(line)


def cmd_encode(args) -> int:
    """``jsonschema encode`` — JSON/JSONL → JSON BinPack v1 binary,
    byte-exact with the reference (``src/command_encode.cc``; codec in
    ``sources/binjson.py``). JSONL entries share one encoder stream so
    repeated keys/strings back-reference. With ``-o`` instead of a
    positional output, the dataset-scale analog runs: JSONL →
    columnar parquet (schema-aware encodings play the binary role at
    scale, SURVEY §2.1), printing the same compression-ratio metric."""
    import glob as _glob
    import os

    if args.output is None:
        # reference single-file mode: encode DOC OUT
        if len(args.inputs) < 2:
            return _positional_error(
                args, "This command expects a path to a JSON document "
                "and an output path",
                "jsonschema encode path/to/document.json "
                "path/to/output.binpack")
        from jsonschema_ray.sources.binjson import Encoder

        doc_path, out_path = args.inputs[0], args.inputs[1]
        orig = os.path.getsize(doc_path)
        print(f"original file size: {orig} bytes", file=sys.stderr)
        enc = Encoder()
        if doc_path.endswith(".jsonl"):
            if args.verbose:
                print("Interpreting input as JSONL: "
                      f"{os.path.realpath(doc_path)}", file=sys.stderr)
            for i, entry in enumerate(_jsonl_entries(doc_path)):
                if args.verbose:
                    print(f"Encoding entry #{i}", file=sys.stderr)
                enc.write(entry)
        else:
            enc.write(_load_schema_doc(doc_path, configured=False))
        with open(out_path, "wb") as f:
            f.write(bytes(enc.buf))
        total = len(enc.buf)
        print(f"encoded file size: {total} bytes", file=sys.stderr)
        print(f"compression ratio: {total * 100 // orig}%",
              file=sys.stderr)
        return EXIT_OK

    from jsonschema_ray.sources.readers import JsonlSource

    _ensure_ray(args.num_cpus)
    JsonlSource(args.inputs).dataset().write_parquet(args.output)
    orig = sum(os.path.getsize(f) for pat in args.inputs
               for f in (_glob.glob(pat) or [pat]))
    enc = sum(os.path.getsize(os.path.join(r, f))
              for r, _, fs in os.walk(args.output) for f in fs)
    pct = (enc * 100.0 / orig) if orig else 0.0
    print(json.dumps({"original_bytes": orig, "encoded_bytes": enc,
                      "ratio_pct": round(pct, 1)}))
    return EXIT_OK


def cmd_decode(args) -> int:
    """``jsonschema decode`` — JSON BinPack v1 binary → prettified
    JSON/JSONL, byte-exact with the reference
    (``src/command_decode.cc``: a ``.jsonl`` output path selects the
    multi-entry stream mode). With ``-o``, the dataset-scale analog:
    parquet → JSONL."""
    import os

    if args.output is None:
        if len(args.inputs) < 2:
            return _positional_error(
                args, "This command expects a path to a binary file "
                "and an output path",
                "jsonschema decode path/to/output.binpack "
                "path/to/document.json")
        from jsonschema_ray.sources.binjson import (decode_document,
                                                    decode_stream)
        from jsonschema_ray.spec.format import prettify_json

        in_path, out_path = args.inputs[0], args.inputs[1]
        with open(in_path, "rb") as f:
            data = f.read()
        parts = []
        if out_path.endswith(".jsonl"):
            if args.verbose:
                print("Interpreting input as JSONL: "
                      f"{os.path.realpath(in_path)}", file=sys.stderr)
            for i, doc in enumerate(decode_stream(data)):
                if args.verbose:
                    print(f"Decoding entry #{i}", file=sys.stderr)
                parts.append(prettify_json(doc))
        else:
            parts.append(prettify_json(decode_document(data)))
        with open(out_path, "w") as f:
            f.write("\n".join(parts) + "\n")
        return EXIT_OK

    from jsonschema_ray.sources.readers import ParquetSource

    _ensure_ray(args.num_cpus)
    ds = ParquetSource(args.inputs).dataset()
    if args.output == "-":
        for row in ds.iter_rows():
            print(json.dumps(row, default=str))
    else:
        ds.write_json(args.output)
    return EXIT_OK


def cmd_bundle(args) -> int:
    """Emit a self-contained schema: every reference whose base URI
    resolves outside the document is embedded under the dialect's
    definitions container, keyed by its canonical URI, with $id/$schema
    made explicit (the ``jsonschema bundle`` verb,
    ``/root/reference/src/command_bundle.cc`` →
    ``vendor/blaze/src/bundle/bundle.cc``; see spec/bundle.py).

    Resolution order for an external URI: ``--resolve`` pre-imports
    (files or directories; declared ``$id`` and file path both
    register), project-config ``resolve`` remaps + installed
    ``dependencies``, ``file://`` reads, ``--store`` (from `install`),
    then live ``--http`` fetch. ``--without-id`` strips identifiers and
    rewrites refs to plain JSON pointers (the reference's `for_editor`
    mode, with its warning). ``-`` reads the schema from stdin."""
    import os

    from jsonschema_ray.spec.bundle import bundle_schema
    from jsonschema_ray.spec.clierrors import (CLIError,
                                               DuplicateIdentifierError,
                                               JSONParseError,
                                               NoSuchFileError,
                                               NotSchemaError, emit,
                                               validate_http_headers)
    from jsonschema_ray.spec.format import prettify_schema

    json_mode = getattr(args, "as_json", False)

    def parse_error(exc, path):
        return JSONParseError(exc.lineno, exc.colno, filePath=path)

    try:
        validate_http_headers(getattr(args, "header", None))
        if not getattr(args, "schema", None):
            from jsonschema_ray.spec.clierrors import CLIArgumentError

            err = CLIArgumentError("This command expects a path to a "
                                   "schema")
            err.hint = "For example: jsonschema bundle path/to/schema.json"
            raise err

        from_stdin = args.schema == "-"
        if from_stdin:
            display = "/dev/stdin"
            root_path = os.path.join(os.getcwd(), "stdin")
            raw_text = sys.stdin.read()
            from jsonschema_ray.state.inputs import _parse_text

            root, _yaml = _parse_text(raw_text, display, "")
        else:
            root_path = os.path.abspath(args.schema)
            display = os.path.realpath(root_path)
            if not os.path.exists(root_path):
                raise NoSuchFileError(display)
            from jsonschema_ray.state.inputs import _read_entry

            entry = _read_entry(display)
            raw_text = entry.text
            root = entry.parsed()
            from jsonschema_ray.state.config import (apply_to_schema,
                                                     discover)

        if not isinstance(root, (dict, bool)):
            raise NotSchemaError(display)

        store = None
        if getattr(args, "store", None):
            from jsonschema_ray.sources.fetch import SchemaStore

            store = SchemaStore(args.store)

        from jsonschema_ray.state.config import discover as _discover

        cfg0 = _discover(os.path.dirname(root_path)) \
            if not from_stdin else _discover(os.getcwd())
        cfg_ignores = [os.path.realpath(i)
                       for i in (cfg0 or {}).get("ignore") or []]
        cfg_ignores += [os.path.realpath(i)
                        for i in getattr(args, "ignore", None) or []]

        def _cfg_ignored(p):
            rp = os.path.realpath(p)
            return any(rp == b or rp.startswith(b.rstrip("/") + "/")
                       for b in cfg_ignores)

        registry: dict = {}
        seen_ids: dict = {}
        for r in getattr(args, "resolve", None) or []:
            paths = []
            if os.path.isdir(r):
                for dirpath, _dirs, names in os.walk(r):
                    paths.extend(os.path.join(dirpath, n)
                                 for n in sorted(names)
                                 if n.endswith((".json", ".yaml", ".yml")))
            elif os.path.exists(r):
                paths.append(r)
            else:
                raise NoSuchFileError(os.path.realpath(r))
            for p in sorted(paths):
                if _cfg_ignored(p) or os.path.getsize(p) == 0:
                    continue
                from jsonschema_ray.state.inputs import _read_entry

                if args.debug:
                    print(f"debug: Detecting schema resources from "
                          f"file: {os.path.realpath(p)}", file=sys.stderr)
                try:
                    doc = _read_entry(os.path.abspath(p)).parsed()
                except json.JSONDecodeError as exc:
                    raise parse_error(exc, os.path.realpath(p)) from exc
                registry[f"file://{os.path.abspath(p)}"] = doc
                if args.debug:
                    print(f"debug: Importing schema into the resolution "
                          f"context: file://{os.path.realpath(p)}",
                          file=sys.stderr)
                    if isinstance(doc, dict) \
                            and isinstance(doc.get("$id") or doc.get("id"),
                                           str):
                        print(f"debug: Importing schema into the "
                              f"resolution context: "
                              f"{doc.get('$id') or doc.get('id')}",
                              file=sys.stderr)
                if isinstance(doc, dict):
                    did = doc.get("$id") or doc.get("id")
                    if isinstance(did, str):
                        if did in seen_ids and seen_ids[did] != doc:
                            raise DuplicateIdentifierError(
                                did, filePath=os.path.realpath(p))
                        seen_ids[did] = doc
                        registry.setdefault(did, doc)
        # project-config resolve remaps + installed dependencies
        # (jsonschema.json next to the schema)
        from jsonschema_ray.state.config import discover

        cfg = discover(os.path.dirname(root_path))
        if cfg is not None and (args.verbose or args.debug) \
                and (getattr(args, "resolve", None)):
            from jsonschema_ray.state.config import find_configuration
            from jsonschema_ray.state.inputs import resolve_extensions

            if args.debug:
                cfgp = find_configuration(os.path.dirname(root_path))
                print(f"debug: Using configuration file: "
                      f"{os.path.realpath(cfgp)}", file=sys.stderr)
            resolve_extensions(None, cfg, verbose=True, log=sys.stderr)
        for s_uri, d_uri in ((cfg or {}).get("resolve") or {}).items():
            tgt = next((d for d in registry.values() if isinstance(d, dict)
                        and (d.get("$id") or d.get("id")) == d_uri), None)
            if tgt is None and (d_uri.startswith("file://")
                                or os.path.exists(d_uri)):
                try:
                    tgt = _load_schema_doc(d_uri.replace("file://", "", 1),
                                           configured=False)
                except OSError:
                    tgt = None
            if tgt is not None:
                registry[s_uri] = tgt
        for dep_uri, dep_path in ((cfg or {}).get("dependencies")
                                  or {}).items():
            if dep_uri in registry:
                continue
            full = dep_path if os.path.isabs(dep_path) else \
                os.path.join((cfg or {}).get("_dir", "."), dep_path)
            if os.path.isfile(full):
                try:
                    dep_doc = _load_schema_doc(full, configured=False)
                except Exception:   # noqa: BLE001 — broken dep: skip
                    continue
                registry[dep_uri] = dep_doc
                if isinstance(dep_doc, dict):
                    dep_id = dep_doc.get("$id") or dep_doc.get("id")
                    if isinstance(dep_id, str):
                        registry.setdefault(dep_id, dep_doc)

        def resolver(uri: str):
            doc = registry.get(uri)
            if doc is not None:
                return doc
            # configuration resolve matching tries the implicit
            # extensions both ways (pass_resolve_config_match_implicit_*)
            for ext in (".json", ".yaml", ".yml"):
                doc = registry.get(uri + ext)
                if doc is not None:
                    return doc
                if uri.endswith(ext):
                    doc = registry.get(uri[:-len(ext)])
                    if doc is not None:
                        return doc
            if uri.startswith("file://"):
                try:
                    return _load_schema_doc(uri[len("file://"):])
                except OSError:
                    return None
            if store is not None:
                doc = store.resolve(uri)
                if doc is not None:
                    return doc
            if getattr(args, "http", False):
                import json as _json

                from jsonschema_ray.sources.fetch import (FetchStatusError,
                                                          fetch_schema)
                from jsonschema_ray.spec.clierrors import (EXIT_OTHER_INPUT,
                                                           JSONParseError)

                # failure surfaces mirror validate --http (reference
                # test/ci fail_bundle_http_*): non-200 → exit 6 + uri,
                # unparseable body → JSON parse error (exit 6)
                try:
                    return fetch_schema(
                        uri, headers=getattr(args, "header", None))
                except FetchStatusError:
                    err = CLIError("Failed to fetch schema")
                    err.fields = {"uri": uri}
                    err.exit_code = EXIT_OTHER_INPUT
                    raise err from None
                except _json.JSONDecodeError as exc:
                    raise JSONParseError(exc.lineno, exc.colno) from None
                except OSError:
                    return None  # unreachable host: unresolvable
            return None

        cfg_dd = None
        if cfg0 and cfg0.get("defaultDialect") and not from_stdin:
            # extension-gated (configuration applies_to)
            from jsonschema_ray.state.config import apply_to_schema as _ap

            probe = _ap({}, cfg0, root_path, mount_resolves=False)
            cfg_dd = probe.get("$schema")
        try:
            bundled = bundle_schema(
                root, resolver,
                default_dialect=getattr(args, "default_dialect", None)
                or cfg_dd,
                default_id=f"file://{root_path}")
        except CLIError as err:
            from types import SimpleNamespace

            raise _stamp_fmt_error(
                err, SimpleNamespace(text=raw_text, path=display)) from err
        if getattr(args, "without_id", False):
            print(
                "warning: You are opting in to remove schema identifiers "
                "in the bundled schema.\n"
                "The only legit use case of this advanced feature we know "
                "of is to workaround\n"
                "non-compliant JSON Schema implementations such as Visual "
                "Studio Code.\n"
                "Otherwise, this is not needed and may harm other use "
                "cases. For example,\n"
                "you will be unable to reference the resulting schema "
                "from other schemas\n"
                "using the --resolve/-r option.", file=sys.stderr)
            from jsonschema_ray.spec.bundle import strip_identifiers

            bundled = strip_identifiers(bundled)
        out = prettify_schema(
            bundled, default_dialect=getattr(args, "default_dialect", None))
    except CLIError as err:
        return emit(err, json_mode=json_mode)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    else:
        sys.stdout.write(out)
    return EXIT_OK


def cmd_install(args) -> int:
    """Fetch remote schemas into a local store + lock file (the
    ``jsonschema install`` verb,
    ``/root/reference/src/command_install.cc:273-465``: vendored
    dependency fetch with ``jsonschema.lock.json``; ``--frozen``
    verifies the lock without refreshing).  With no URIs and
    ``--frozen``, every locked entry is verified."""
    if not getattr(args, "to", None):
        # reference project mode: jsonschema.json dependencies +
        # jsonschema.lock.json (src/command_install.cc)
        import os

        from jsonschema_ray.state.install import run_install

        return run_install(os.getcwd(), list(args.uris),
                           frozen=args.frozen, force=args.force,
                           json_mode=getattr(args, "as_json", False),
                           verbose=getattr(args, "verbose", False),
                           http=getattr(args, "http", False),
                           headers=getattr(args, "header", None),
                           debug=getattr(args, "debug", False))
    from jsonschema_ray.sources.fetch import SchemaStore

    store = SchemaStore(args.to)
    uris = args.uris or (store.uris() if args.frozen else [])
    if not uris:
        print("install: no URIs given and lock is empty", file=sys.stderr)
        return EXIT_ERROR
    failed = 0
    for uri in uris:
        try:
            entry = store.install(uri, force=args.force, frozen=args.frozen)
            print(f"{'verified' if args.frozen else 'installed'}: {uri} -> "
                  f"{entry['path']} ({entry['sha256'][:12]})",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — per-URI diagnostics
            failed += 1
            print(f"install: {uri}: {e}", file=sys.stderr)
    return EXIT_ERROR if failed else EXIT_OK


def cmd_rdf(args) -> int:
    """Promote instances to expanded-form JSON-LD via ``x-jsonld-*``
    schema annotations (the ``jsonschema rdf`` verb,
    ``/root/reference/src/command_rdf.cc:100-220``, vocabulary in
    ``docs/rdf.markdown``).  Single-instance mode prints the expanded
    document; ``--table`` mode promotes a JSON payload column of a
    parquet/JSONL dataset distributed (actor-pool ``map_batches``,
    schema compiled once per actor)."""
    from jsonschema_ray.spec.jsonld import ResolutionError, promote

    if not getattr(args, "table", None):
        from jsonschema_ray.spec.rdf_cli import run as _ref_rdf

        return _ref_rdf(args)
    schema = _load_schema_doc(args.paths[0])
    if getattr(args, "table", None):
        _ensure_ray(args.num_cpus)
        from jsonschema_ray.spec.jsonld import PromoteBatch

        src = _input_source([args.table])
        ds = src.dataset().map_batches(
            PromoteBatch,
            fn_constructor_kwargs={"schema": schema, "column": args.column},
            batch_format="pyarrow", concurrency=(1, 8))
        if args.output:
            ds.write_parquet(args.output)
            print(f"wrote {args.output}", file=sys.stderr)
        else:
            for row in ds.limit(args.limit).to_pandas().itertuples(
                    index=False):
                print(getattr(row, "jsonld"))
        return EXIT_OK
    import os

    resources: dict = {}
    for r in getattr(args, "resolve", None) or []:
        paths = [r]
        if os.path.isdir(r):
            paths = sorted(
                os.path.join(dp, n) for dp, _d, ns in os.walk(r)
                for n in ns if n.endswith((".json", ".yaml", ".yml")))
        for p in paths:
            rdoc = _load_schema_doc(os.path.abspath(p))
            resources[f"file://{os.path.abspath(p)}"] = rdoc
            resources[os.path.abspath(p)] = rdoc
            if isinstance(rdoc, dict):
                did = rdoc.get("$id") or rdoc.get("id")
                if isinstance(did, str):
                    resources.setdefault(did, rdoc)
    ctx_doc = None
    if getattr(args, "compact", None):
        ctx_doc = _load_schema_doc(args.compact, configured=False)
    rc = EXIT_OK
    for path in args.instances:
        inst = _load_schema_doc(path, configured=False)
        try:
            from jsonschema_ray.spec.format import prettify_json
            from jsonschema_ray.spec.jsonld import compact as _compact
            from jsonschema_ray.spec.jsonld import flatten as _flatten

            result = promote(schema, inst, resources=resources or None)
            if getattr(args, "flatten", False):
                result = _flatten(result)
            if ctx_doc is not None:
                result = _compact(result, ctx_doc)
            print(prettify_json(result))
            print(f"ok: {path}", file=sys.stderr)
        except ResolutionError as e:
            print(f"rdf: {path}: {e}", file=sys.stderr)
            rc = EXIT_ERROR
        except ValueError as e:
            print(f"fail: {path}\n  {e}", file=sys.stderr)
            rc = EXIT_VALIDATION
    return rc


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jsonschema_ray")
    sub = p.add_subparsers(dest="verb", required=True)

    c = sub.add_parser("compile", add_help=False)
    c.add_argument("paths", nargs="*",
                   help="schema file (reference mode)")
    c.add_argument("--schema")
    c.add_argument("-o", "--output")
    c.add_argument("-f", "--fast", action="store_true")
    c.add_argument("-m", "--minify", action="store_true")
    c.add_argument("-n", "--include", action="append", default=[])
    c.add_argument("-p", "--entrypoint", action="append", default=[])
    c.add_argument("-F", "--format-assertion", action="store_true")
    c.add_argument("-O", "--optimize", action="store_true",
                   help="CheckPlan postprocess pass: constant folding, "
                        "flattening, bound fusion, dead-rule elimination")
    c.add_argument("-r", "--resolve", action="append", default=[])
    c.add_argument("-d", "--default-dialect")
    c.add_argument("-v", "--verbose", action="store_true")
    c.add_argument("-g", "--debug", action="store_true")
    c.add_argument("-j", "--json", dest="as_json", action="store_true")
    c.add_argument("-h", "--http", action="store_true")
    c.add_argument("-H", "--header", action="append", default=[])
    c.set_defaults(fn=cmd_compile)

    v = sub.add_parser("validate", add_help=False)
    v.add_argument("inputs", nargs="*", default=[])
    v.add_argument("--instance", nargs="+",
                   help="single-instance mode: validate JSON/YAML "
                        "document file(s) against --schema driver-side")
    v.add_argument("--continue", dest="cont", action="store_true",
                   help="instance mode: report every failing "
                        "entry/file instead of stopping at the first "
                        "(reference --continue)")
    v.add_argument("-F", "--format-assertion", action="store_true",
                   help="force every `format` to assert (default: "
                        "annotation unless x-format-assertion: true)")
    v.add_argument("--entrypoint", default="",
                   help="JSON pointer into --schema to use as the "
                        "validation root (single-instance mode)")
    v.add_argument("-r", "--resolve", action="append", default=[],
                   help="pre-import a schema file into the resolver "
                        "(repeatable): registers its $id/id and its "
                        "path relative to --schema (reference -r)")
    v.add_argument("--plan", default="default")
    v.add_argument("--schema")
    v.add_argument("--catalog")
    v.add_argument("--catalog-key", default="media_ref")
    v.add_argument("--out")
    v.add_argument("--fast", action="store_true")
    v.add_argument("--json", action="store_true")
    v.add_argument("--only")
    v.add_argument("--exclude")
    v.add_argument("--limit", type=int, default=20)
    v.add_argument("-t", "--trace", type=int, nargs="?", const=-1,
                   default=0,
                   help="reference mode: instruction trace (bare flag); "
                        "dataset mode: per-(doc,rule,span) outcome rows "
                        "for the first N docs")
    v.add_argument("-b", "--benchmark", action="store_true")
    v.add_argument("--loop", default=None)
    v.add_argument("--template", default=None)
    v.add_argument("-e", dest="entrypoint_short", default=None,
                   help=argparse.SUPPRESS)
    v.add_argument("-d", "--default-dialect", default=None)
    v.add_argument("-v", "--verbose", action="store_true")
    v.add_argument("-g", "--debug", action="store_true")
    v.add_argument("-f", dest="fast_short", action="store_true",
                   help=argparse.SUPPRESS)
    v.add_argument("-j", dest="json_short", action="store_true",
                   help=argparse.SUPPRESS)
    v.add_argument("-H", "--header", action="append", default=[])
    v.add_argument("-h", "--http", action="store_true")
    v.add_argument("--num-cpus", type=int, default=None)
    v.add_argument("--extension", action="append", default=[],
                   help="when an input is a directory, only scan files "
                        "with this extension (repeatable; default "
                        "json/yaml/yml; '' = extensionless)")
    v.add_argument("--ignore", action="append", default=[],
                   help="skip files under this path prefix (repeatable)")
    v.add_argument("--checked", action="store_true",
                   help="position-tracked JSON/JSONL parse: malformed "
                        "documents report path:line:col and abort "
                        "(reference parse-error UX)")
    v.add_argument("--fail-fast", action="store_true",
                   help="stop at the first violations instead of an "
                        "exhaustive report (streaming early-exit)")
    v.set_defaults(fn=cmd_validate)

    r = sub.add_parser("run")
    r.add_argument("inputs", nargs="+")
    r.add_argument("--out", required=True)
    r.add_argument("--plan", default="default")
    r.add_argument("--schema")
    r.add_argument("--catalog")
    r.add_argument("--catalog-key", default="media_ref")
    r.add_argument("--shard-size", type=int, default=8)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_run)

    cu = sub.add_parser("curate")
    cu.add_argument("inputs", nargs="+")
    cu.add_argument("--op", required=True, choices=CURATE_OPS)
    cu.add_argument("--out", required=True)
    cu.add_argument("--key-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--shard-size", type=int, default=8)
    cu.add_argument("--num-cpus", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    e = sub.add_parser("encode")
    e.add_argument("inputs", nargs="*", default=[])
    e.add_argument("-o", "--output", default=None,
                   help="parquet output dir (dataset mode); omit for "
                        "the reference's positional DOC OUT form")
    e.add_argument("--json", "-j", action="store_true", dest="as_json")
    e.add_argument("--verbose", "-v", action="store_true")
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_encode)

    dd = sub.add_parser("decode")
    dd.add_argument("inputs", nargs="*", default=[])
    dd.add_argument("-o", "--output", default=None,
                    help="JSONL output dir (dataset mode); omit for "
                         "the reference's positional IN OUT form")
    dd.add_argument("--json", "-j", action="store_true", dest="as_json")
    dd.add_argument("--verbose", "-v", action="store_true")
    dd.add_argument("--num-cpus", type=int, default=None)
    dd.set_defaults(fn=cmd_decode)

    b = sub.add_parser("bundle")
    b.add_argument("schema", nargs="?", default=None,
                   help="schema file or - (stdin)")
    b.add_argument("-o", "--output")
    b.add_argument("--without-id", action="store_true", dest="without_id",
                   help="strip identifiers and rewrite refs to local "
                        "JSON pointers (the reference's editor mode)")
    b.add_argument("-j", "--json", action="store_true", dest="as_json")
    b.add_argument("-v", "--verbose", action="store_true")
    b.add_argument("-g", "--debug", action="store_true")
    b.add_argument("-H", "--header", action="append", default=[])
    b.add_argument("--ignore", action="append", default=[])
    b.add_argument("-e", "--extension", action="append", default=[])
    b.add_argument("-r", "--resolve", action="append",
                   help="pre-import a schema file or directory into the "
                        "resolver (repeatable; registers declared $id and "
                        "file path)")
    b.add_argument("-d", "--default-dialect",
                   help="dialect to assume when a document does not "
                        "declare $schema")
    b.add_argument("--store",
                   help="schema store directory (from `install`) for "
                        "resolving remote $refs offline")
    b.add_argument("--http", action="store_true",
                   help="allow fetching unresolved remote $refs live")
    b.set_defaults(fn=cmd_bundle)

    ins = sub.add_parser("install")
    ins.add_argument("uris", nargs="*", default=[],
                     help="schema URIs to install (http/https/file)")
    ins.add_argument("--to", default=None,
                     help="store directory mode (lock file lives "
                          "there); default is the project-config mode "
                          "(jsonschema.json dependencies)")
    ins.add_argument("--json", "-j", action="store_true", dest="as_json")
    ins.add_argument("--verbose", "-v", action="store_true")
    ins.add_argument("--http", action="store_true",
                     help="allow live http(s) fetches")
    ins.add_argument("-H", "--header", action="append", default=[],
                     help='HTTP header ("Name: Value", repeatable)')
    ins.add_argument("--debug", "-g", action="store_true")
    ins.add_argument("--force", action="store_true",
                     help="re-fetch even if already installed")
    ins.add_argument("--frozen", action="store_true",
                     help="verify the lock instead of refreshing it")
    ins.set_defaults(fn=cmd_install)

    rdf = sub.add_parser("rdf", add_help=False)
    rdf.add_argument("paths", nargs="*", default=[],
                     help="schema then instance (or - for stdin)")
    rdf.add_argument("--table",
                     help="promote a dataset instead: parquet/JSONL path "
                          "whose --column holds JSON payloads")
    rdf.add_argument("--column", default="props")
    rdf.add_argument("-o", "--output",
                     help="(table mode) write promoted parquet here")
    rdf.add_argument("--limit", type=int, default=20)
    rdf.add_argument("-l", "--flatten", action="store_true",
                     help="flatten the output: label every node, hoist "
                          "nested nodes (reference --flatten)")
    rdf.add_argument("-c", "--compact",
                     help="compact the output against this JSON/YAML "
                          "context file (reference --compact)")
    rdf.add_argument("-r", "--resolve", action="append", default=[],
                     help="pre-import a schema file or directory")
    rdf.add_argument("-f", "--fast", action="store_true")
    rdf.add_argument("-F", "--format-assertion", action="store_true")
    rdf.add_argument("-d", "--default-dialect")
    rdf.add_argument("-v", "--verbose", action="store_true")
    rdf.add_argument("-g", "--debug", action="store_true")
    rdf.add_argument("-j", "--json", dest="as_json", action="store_true")
    rdf.add_argument("-h", "--http", action="store_true")
    rdf.add_argument("-H", "--header", action="append", default=[])
    rdf.add_argument("--num-cpus", type=int, default=None)
    rdf.set_defaults(fn=cmd_rdf)

    m = sub.add_parser("metaschema")
    m.add_argument("paths", nargs="*", default=[],
                   help="schema files, directories, or - (stdin)")
    m.add_argument("--plan", default=None,
                   help="self-check a CheckPlan artifact instead")
    m.add_argument("--schema", default=None,
                   help=argparse.SUPPRESS)   # legacy plan-mode flag
    m.add_argument("-d", "--default-dialect")
    m.add_argument("-r", "--resolve", action="append", default=[])
    m.add_argument("-j", "--json", action="store_true", dest="as_json")
    m.add_argument("-v", "--verbose", action="store_true")
    m.add_argument("-g", "--debug", action="store_true")
    m.add_argument("-e", "--extension", action="append", default=[])
    m.add_argument("--ignore", action="append", default=[])
    m.add_argument("-F", "--format-assertion", action="store_true",
                   dest="format_assertion")
    m.add_argument("-t", "--trace", action="store_true")
    m.add_argument("-H", "--header", action="append", default=[])
    m.set_defaults(fn=cmd_metaschema)

    u = sub.add_parser("upgrade")
    u.add_argument("schema_pos", nargs="?", default=None,
                   help="schema file or - (stdin)")
    u.add_argument("--plan", default=None,
                   help="migrate a legacy CheckPlan document instead")
    u.add_argument("-o", "--output")
    u.add_argument("--schema", action="store_true",
                   help="accepted for compatibility (schema documents "
                        "are the default upgrade input)")
    u.add_argument("-t", "--to", default="2020-12",
                   help="target dialect: draft4/draft6/draft7/"
                        "2019-09/2020-12")
    u.add_argument("-m", "--meta", action="store_true",
                   help="metaschema mode: inject/migrate $vocabulary "
                        "(reference upgrade --meta)")
    u.add_argument("-d", "--default-dialect")
    u.add_argument("-r", "--resolve", action="append", default=[])
    u.add_argument("-j", "--json", action="store_true", dest="as_json")
    u.add_argument("-v", "--verbose", action="store_true")
    u.add_argument("-g", "--debug", action="store_true")
    u.add_argument("-H", "--header", action="append", default=[])
    u.set_defaults(fn=cmd_upgrade)

    f = sub.add_parser("fmt")
    f.add_argument("paths", nargs="*", default=[],
                   help="schema files, directories, or - (stdin); "
                        "none = config-path/cwd recursive walk")
    f.add_argument("--plan", default=None,
                   help="format a CheckPlan rules file instead of "
                        "schema documents")
    f.add_argument("-c", "--check", action="store_true")
    f.add_argument("--schema", action="store_true",
                   help="accepted for compatibility (schema documents "
                        "are now the default fmt input)")
    f.add_argument("-i", "--indentation", type=int, default=2,
                   help="spaces per level (reference fmt --indentation)")
    f.add_argument("-k", "--keep-ordering", action="store_true",
                   help="prettify only, keep key order")
    f.add_argument("-d", "--default-dialect",
                   help="dialect to assume when the document does not "
                        "declare $schema (reference --default-dialect)")
    f.add_argument("-j", "--json", action="store_true", dest="as_json")
    f.add_argument("-v", "--verbose", action="store_true")
    f.add_argument("-g", "--debug", action="store_true")
    f.add_argument("-e", "--extension", action="append", default=[])
    f.add_argument("--ignore", action="append", default=[])
    f.add_argument("-r", "--resolve", action="append", default=[])
    f.add_argument("--http", action="store_true")
    f.add_argument("-H", "--header", action="append", default=[])
    f.set_defaults(fn=cmd_fmt)

    li = sub.add_parser("lint", add_help=False)
    li.add_argument("paths", nargs="*",
                    help="schema files or directories (none = config "
                         "path / cwd walk)")
    li.add_argument("--plan", default=None,
                    help="lint a CheckPlan rules file instead (this "
                         "engine's own artifact)")
    li.add_argument("--schema", default=None,
                    help=argparse.SUPPRESS)   # legacy alias: a schema path
    li.add_argument("-f", "--fix", action="store_true")
    li.add_argument("-m", "--format", dest="format_output",
                    action="store_true")
    li.add_argument("-F", "--format-assertion", action="store_true")
    li.add_argument("-k", "--keep-ordering", action="store_true")
    li.add_argument("-l", "--list", dest="list_rules",
                    action="store_true")
    li.add_argument("-e", "--extension", action="append", default=[])
    li.add_argument("-x", "--exclude", action="append", default=[],
                    metavar="RULE")
    li.add_argument("-o", "--only", action="append", default=[],
                    metavar="RULE")
    li.add_argument("-i", "--ignore", action="append", default=[])
    li.add_argument("-n", "--indentation", default=None)
    li.add_argument("-a", "--rule", action="append", default=[])
    li.add_argument("-t", "--top-level-rule", action="append",
                    default=[])
    li.add_argument("-v", "--verbose", action="store_true")
    li.add_argument("-g", "--debug", action="store_true")
    li.add_argument("-j", "--json", dest="as_json", action="store_true")
    li.add_argument("-r", "--resolve", action="append", default=[])
    li.add_argument("-d", "--default-dialect")
    li.add_argument("-h", "--http", action="store_true")
    li.add_argument("-H", "--header", action="append", default=[])
    li.set_defaults(fn=cmd_lint)

    t = sub.add_parser("test", add_help=False)
    t.add_argument("paths", nargs="*",
                   help="test documents or directories (none = config "
                        "path / cwd walk)")
    t.add_argument("--plan", default="default",
                   help="CheckPlan for the legacy Ray suite format")
    t.add_argument("--report")
    t.add_argument("-e", "--extension", action="append", default=[])
    t.add_argument("-i", "--ignore", action="append", default=[])
    t.add_argument("-F", "--format-assertion", action="store_true")
    t.add_argument("-r", "--resolve", action="append", default=[],
                   help="pre-import a schema file or directory for "
                        "resolving URI test targets (reference -r)")
    t.add_argument("-d", "--default-dialect")
    t.add_argument("-v", "--verbose", action="store_true")
    t.add_argument("-g", "--debug", action="store_true")
    t.add_argument("-j", "--json", dest="as_json", action="store_true")
    t.add_argument("-h", "--http", action="store_true")
    t.add_argument("-H", "--header", action="append", default=[])
    t.add_argument("--num-cpus", type=int, default=None)
    t.set_defaults(fn=cmd_test)

    i = sub.add_parser("inspect")
    i.add_argument("schema_pos", nargs="?", default=None,
                   help="schema file or - (stdin)")
    i.add_argument("--plan", default=None,
                   help="report a CheckPlan's rules/fields/strategies "
                        "instead")
    i.add_argument("--schema", default=None,
                   help=argparse.SUPPRESS)   # legacy plan-mode flag
    i.add_argument("-d", "--default-dialect")
    i.add_argument("-r", "--resolve", action="append", default=[])
    i.add_argument("-j", "--json", action="store_true", dest="as_json")
    i.add_argument("-v", "--verbose", action="store_true")
    i.add_argument("-g", "--debug", action="store_true")
    i.add_argument("-H", "--header", action="append", default=[])
    i.set_defaults(fn=cmd_inspect)

    g = sub.add_parser("codegen")
    g.add_argument("schema_pos", nargs="?", default=None,
                   help="schema file")
    g.add_argument("--plan", default=None,
                   help="emit a standalone pure-Python validator from "
                        "a CheckPlan instead")
    g.add_argument("-o", "--output")
    g.add_argument("--schema", action="store_true",
                   help="accepted for compatibility (schema documents "
                        "are the default codegen input)")
    g.add_argument("-t", "--target", default=None,
                   help="code generation target (typescript)")
    g.add_argument("-r", "--resolve", action="append", default=[],
                   help="pre-import a schema file or directory for "
                        "resolving remote $refs (reference -r)")
    g.add_argument("-n", "--name", default="Schema",
                   help="root type name")
    g.add_argument("-d", "--default-dialect")
    g.add_argument("-j", "--json", action="store_true", dest="as_json")
    g.add_argument("-v", "--verbose", action="store_true")
    g.add_argument("-g", "--debug", action="store_true")
    g.add_argument("-H", "--header", action="append", default=[])
    g.set_defaults(fn=cmd_codegen)
    return p


def main(argv: list[str] | None = None) -> int:
    import sys as _sys

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    # reference parity: `version` / `--version` / `-v` print the version
    # (src/main.cc:280-283)
    if argv and argv[0] in ("version", "--version", "-v"):
        from jsonschema_ray import __version__

        print(__version__)
        return EXIT_OK
    parser = build_parser()
    from jsonschema_ray.spec.clierrors import ArgUsageError, emit

    known_cmds = {"help", "version"}
    for act in parser._subparsers._group_actions:
        known_cmds.update(act.choices or {})
    if argv and argv[0] == "help":
        parser.print_help(_sys.stdout)
        return EXIT_OK
    if argv and not argv[0].startswith("-") \
            and argv[0] not in known_cmds:
        # src/main.cc: unknown verb → typed usage error, exit 5
        err = ArgUsageError("Unknown command")
        err.fields = {"command": argv[0]}
        return emit(err, json_mode=False)

    # classify argparse-level option errors the way the reference's
    # option loop does (flag_with_value.sh / option_without_value.sh /
    # unknown_option.sh)
    import re as _re

    class _ArgErr(Exception):
        pass

    orig_error = parser.error

    def _collect_error(message):
        raise _ArgErr(message)

    # patch every (sub)parser's error hook
    parser.error = _collect_error
    for act in parser._subparsers._group_actions:
        for sp in (act.choices or {}).values():
            sp.error = _collect_error

    def _usage_err(msg: str, option: str | None = None) -> int:
        err = ArgUsageError(msg)
        if option:
            err.fields = {"option": option}
        return emit(err,
                    json_mode=("-j" in argv or "--json" in argv))

    try:
        args, extras = parser.parse_known_args(argv)
    except _ArgErr as e:
        m = str(e)
        mm = _re.search(r"argument (\S+?): ignored explicit argument",
                        m)
        if mm:
            return _usage_err("This flag cannot take a value",
                              mm.group(1).split("/")[-1].lstrip("-"))
        mm = _re.search(r"argument (\S+?): expected one argument", m)
        if mm:
            return _usage_err("This option must take a value",
                              mm.group(1).split("/")[-1].lstrip("-"))
        mm = _re.search(r"argument (\S+?): invalid", m)
        if mm:
            return _usage_err("This option must take a value",
                              mm.group(1).split("/")[-1].lstrip("-"))
        print(f"error: {m}", file=_sys.stderr)
        return EXIT_ARGS
    flagged = [e for e in extras if e.startswith("--") and e != "--"]
    if flagged:
        return _usage_err("Unknown option",
                          flagged[0].split("=", 1)[0].lstrip("-"))
    if extras:
        # argparse cannot resume positionals after optionals
        # (`validate schema --resolve dir instance`): fold trailing
        # non-flag tokens back into the positional list
        leftover_ok = all(not e.startswith("-") or e == "-"
                          for e in extras)
        bucket = None
        for name in ("inputs", "paths", "instances"):
            if hasattr(args, name) and isinstance(
                    getattr(args, name), list):
                bucket = name
                break
        if leftover_ok and bucket:
            getattr(args, bucket).extend(extras)
        else:
            parser.parse_args(argv)   # reproduce the standard error
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return EXIT_ERROR
    except json.JSONDecodeError as e:
        # malformed schema/instance/config input (fail_instance_invalid_json)
        print(f"error: invalid JSON: {e}", file=sys.stderr)
        return EXIT_ERROR
    except _RE_ERROR as e:
        print(f"error: invalid regular expression: {e}", file=sys.stderr)
        return EXIT_ERROR
    except (KeyError, ValueError) as e:
        # schema compile errors: unresolvable $ref, bad entrypoint
        # pointer, unsupported constructs (reference exits 1 with a
        # one-line diagnostic, e.g. fail_invalid_ref.sh)
        print(f"error: {e.args[0] if e.args else e}", file=sys.stderr)
        return EXIT_ERROR


if __name__ == "__main__":
    sys.exit(main())
