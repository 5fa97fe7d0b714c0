"""Replay of the reference's own validate test corpus.

``/root/reference/test/validate/*.sh`` (223 scripts) each write a
schema + instance via heredocs and assert the CLI's exit code. This
harness parses every script (heredoc files, the ``"$1" validate …``
invocation, the expected ``EXIT_CODE``) and replays it through THIS
engine's JSON Schema front-end (``spec/jschema.compile_schema``),
comparing verdict semantics:

  expected 0 / 2        → our is_valid() must agree pass / fail
  expected ≥3 (4/6/…)   → schema-input error: our compile/parse must
                          ALSO reject (exception), any exit-code text
                          aside

Scripts exercising surfaces that are out of replay scope (http
fetches, --template plans, --trace/--benchmark exit-code protocols,
directory-walk flags, project-config discovery) are skipped with the
reason recorded; the few true semantic divergences are pinned in
EXPECTED_DIVERGENT so any regression OR improvement shows up as a
test failure. Fixture source: reference public repo, PUBLIC CONTENT —
parsed for expected verdicts only.
"""

from __future__ import annotations

import glob
import json
import re
import shlex

import pytest

from jsonschema_ray.spec.jschema import compile_schema

CORPUS = "/root/reference/test/validate"

HEREDOC = re.compile(r"cat << '?EOF'? > \"\$TMP/([^\"]+)\"\n(.*?)\nEOF\n",
                     re.S)

# Scripts whose verdict is KNOWN to diverge, with why. Kept small and
# explicit — if one starts agreeing, this test fails so the list stays
# honest.
EXPECTED_DIVERGENT: set[str] = set()

MIN_MATCHES = 223   # ratchet: the full corpus replays verdict-exact


class Skip(Exception):
    pass


def _parse(path: str):
    src = open(path).read()
    files = {m.group(1): m.group(2) for m in HEREDOC.finditer(src)}
    # Pre-pass: lift stdin producers (`echo '..' |`, `printf '..' |`,
    # `cat << 'EOF' |` + body) off the invocation lines, so `-`
    # positionals can be replayed (reference src/input.h:197-226)
    raw = src.split("\n")
    lifted, stdin_at = [], {}
    i = 0
    while i < len(raw):
        ln = raw[i]
        m = re.match(r"\s*(echo|printf) '((?:[^'])*)' \| (.*\"\$1\".*)$",
                     ln)
        if m:
            text = m.group(2)
            text = (text + "\n") if m.group(1) == "echo" \
                else text.replace("\\n", "\n")
            stdin_at[len(lifted)] = text
            lifted.append(m.group(3))
            i += 1
            continue
        m = re.match(r"\s*(?:cat << 'EOF'|printf '((?:[^'])*)') \| "
                     r"gzip > \"\$TMP/([^\"]+)\"\s*$", ln)
        if m:
            # gzip-piped heredoc/printf: the replay reads text, so the
            # uncompressed body IS the file (Arrow/gzip transparency)
            if m.group(1) is not None:
                files[m.group(2)] = m.group(1).replace("\\n", "\n")
                i += 1
                continue
            body, j = [], i + 1
            while j < len(raw) and raw[j] != "EOF":
                body.append(raw[j])
                j += 1
            files[m.group(2)] = "\n".join(body) + "\n"
            i = j + 1
            continue
        m = re.match(r"\s*cat << 'EOF' \| (.*\"\$1\".*)$", ln)
        if m:
            stdin_idx = len(lifted)
            lifted.append(m.group(1))
            j = i
            while raw[j].rstrip().endswith("\\"):
                j += 1
                lifted.append(raw[j])
            body = []
            j += 1
            while j < len(raw) and raw[j] != "EOF":
                body.append(raw[j])
                j += 1
            stdin_at[stdin_idx] = "\n".join(body) + "\n"
            i = j + 1
            continue
        lifted.append(ln)
        i += 1
    joined, starts, buf, start = [], [], "", 0
    for idx, ln in enumerate(lifted):
        if buf == "":
            start = idx
        if ln.rstrip().endswith("\\"):
            buf += ln.rstrip()[:-1] + " "
        else:
            joined.append(buf + ln)
            starts.append(start)
            buf = ""
    shellvars = {m.group(1): m.group(2).replace('\\"', '"')
                 for m in re.finditer(r'^\s*(\w+)="(.*)"\s*$', src, re.M)}
    invs, cwd = [], ""
    for i, ln in enumerate(joined):
        mcd = re.match(r'\s*cd "\$TMP/?([^"]*)"\s*$', ln)
        if mcd:
            cwd = mcd.group(1).rstrip("/")
            cwd = cwd + "/" if cwd else ""
            continue
        if ('"$1"' in ln or '"$BIN"' in ln) and " validate" in ln:
            ln = ln.replace('"$BIN"', '"$1"')
            # process substitution <(echo "$VAR") → synthetic file
            for mps in re.finditer(r'<\(echo "\$(\w+)"\)', ln):
                name = mps.group(1)
                files[f"__psub_{name}.json"] = shellvars.get(name, "")
                ln = ln.replace(mps.group(0),
                                f'"$TMP/__psub_{name}.json"')
            exp = 0
            for la in joined[i:i + 4]:
                m = re.search(r'test "\$EXIT_CODE" = "(\d+)"', la)
                if m:
                    exp = int(m.group(1))
                    break
            invs.append((ln.strip(), exp, stdin_at.get(starts[i]), cwd))
    # every $TMP path the script ever writes (redirect targets and
    # heredoc targets): a referenced input outside this set is
    # genuinely nonexistent → replayable as an input error, not a skip
    created = set(re.findall(r'>\s*"\$TMP/([^"]+)"', src))
    for touched in re.findall(r'touch "\$TMP/([^"]+)"', src):
        files.setdefault(touched, "")        # empty file
        created.add(touched)
    created |= set(files)
    return files, invs, created


def _load_doc(files: dict, key: str):
    if key == "-":
        # stdin: JSON first, then YAML; blank input is an input error
        # (reference src/input.h:197-226, fail_stdin_empty exit 6)
        body = files.get("-")
        if body is None or not body.strip():
            raise ValueError("empty stdin")
        try:
            return [json.loads(body)]
        except Exception:
            import yaml

            doc = yaml.safe_load(body)
            if doc is None:
                raise ValueError("empty stdin")
            return [doc]
    body = files[key]
    if key.endswith(".jsonl") or key.endswith(".gz"):
        return [json.loads(ln) for ln in body.splitlines() if ln.strip()]
    if key.endswith(".json"):
        return [json.loads(body)]
    try:   # extension-less / custom extensions: JSON first, then YAML
        return [json.loads(body)]
    except Exception:
        import yaml

        return list(yaml.safe_load_all(body))


_NEUTRAL_FLAGS = {"-f", "--fast", "-j", "--json", "-v", "--verbose",
                  "--continue", "--debug", "-g"}


def _replay_one(files: dict, inv: str, exp: int, stdin: str | None = None,
                created: set | None = None, cwd: str = ""):
    inv = re.split(r"\s(?:&&|\|\|)\s", inv)[0]
    inv = re.sub(r"\s[12]?>>?\s*\S+", "", inv)
    toks = [t.replace("\\$", "$") for t in shlex.split(inv)]
    if toks[0] != "$1" or toks[1] != "validate":
        raise Skip("not plain validate invocation")
    if stdin is not None:
        files = dict(files, **{"-": stdin})
    pos, resolves, exts, ignores = [], [], [], []
    entry, default_dialect, fassert = "", None, None
    template, loop_bad, trace, bench = False, False, False, False
    header_bad = False
    i = 2
    while i < len(toks):
        t = toks[i]
        if t.startswith("-") and t != "-":
            if t in _NEUTRAL_FLAGS:
                i += 1
            elif t in ("-t", "--trace"):
                trace = True
                i += 1
            elif t in ("-b", "--benchmark"):
                bench = True
                i += 1
            elif t in ("-F", "--format-assertion"):
                fassert = True
                i += 1
            elif t in ("-r", "--resolve"):
                resolves.append(toks[i + 1])
                i += 2
            elif t in ("-e", "--entrypoint"):
                entry = toks[i + 1]
                i += 2
            elif t in ("-d", "--default-dialect"):
                default_dialect = toks[i + 1]
                i += 2
            elif t in ("--template",):
                # precompiled-template reuse: same verdict as compiling
                # the schema (an unreadable template just re-compiles,
                # pass_with_invalid_template.sh)
                template = True
                i += 2
            elif t in ("--extension",):
                exts.append(toks[i + 1].lstrip("."))
                i += 2
            elif t in ("--ignore", "-i"):
                ignores.append(toks[i + 1])
                i += 2
            elif t in ("--header", "-H"):
                if i + 1 >= len(toks) or ":" not in toks[i + 1]:
                    header_bad = True
                    i += 1
                else:
                    i += 2
            elif t in ("--loop",):
                if i + 1 >= len(toks) or not toks[i + 1].isdigit() \
                        or int(toks[i + 1]) < 1:
                    loop_bad = True
                    i += 1
                else:
                    i += 2
            else:
                raise Skip(f"flag {t} out of replay scope")
        else:
            pos.append(t)
            i += 1
    if template and (entry or fassert):
        # the reference rejects --template combined with flags that
        # change compilation (exit 5 family)
        return exp not in (0, 2), "reject", "template flag conflict"
    if loop_bad:
        return exp not in (0, 2), "reject", "invalid --loop value"
    if header_bad:
        # malformed "Name: Value" header (fail_invalid_header exit 5)
        return exp not in (0, 2), "reject", "malformed --header"
    if trace and bench:
        return exp not in (0, 2), "reject", "--trace with --benchmark"
    if (trace or bench) and (
            len(pos) > 2
            or (trace and any(p.endswith((".jsonl", ".jsonl.gz"))
                              for p in pos[1:]))
            or any(p.startswith("$TMP/") and p[5:] not in files
                   for p in pos[1:])):
        # single-instance-only flags reject directories / JSONL /
        # multiple instances (fail_trace_*/fail_benchmark_* exit 5)
        return exp not in (0, 2), "reject", "trace/benchmark instance kind"
    if pos.count("-") > 1:
        # at most one positional may read stdin
        # (fail_stdin_multiple exit 5)
        return exp not in (0, 2), "reject", "multiple stdin positionals"
    if len(pos) == 0:
        # a schema is required (fail_no_schema exit 5)
        return exp not in (0, 2), "reject", "missing positionals"
    if len(pos) == 1:
        # schema only: the reference recursively processes every file
        # in the CWD as instances (pass_cwd.sh "Recursively processing
        # every file in ...")
        pos.append("$TMP/" + cwd)

    if default_dialect and "://" not in default_dialect:
        # dialect given as a FILE PATH (relative to the cwd): the
        # reference reads the metaschema and dialects by its $id
        # (pass_default_dialect_cli_relative.sh)
        import posixpath

        dkey = default_dialect[5:] if default_dialect.startswith("$TMP/") \
            else posixpath.normpath(cwd + default_dialect)
        if dkey in files:
            try:
                mdoc = _load_doc(files, dkey)[0]
                if isinstance(mdoc, dict) and mdoc.get("$id"):
                    default_dialect = mdoc["$id"]
            except Exception:
                pass

    # project config discovery (jsonschema.json next to the inputs):
    # defaultDialect (string URI, gated by the configured extension
    # list), ignore paths (reference src/configuration.h flows)
    cfg_ext = None
    if "jsonschema.json" in files:
        try:
            cfg = json.loads(files["jsonschema.json"])
            if not isinstance(cfg, dict):
                raise ValueError("config must be an object")
            cdd = cfg.get("defaultDialect")
            if cdd is not None:
                if not isinstance(cdd, str) or "://" not in cdd:
                    raise ValueError("invalid defaultDialect")
            cext = cfg.get("extension")
            if isinstance(cext, str):
                cext = [cext]
            if cext:
                cfg_ext = [e.lstrip(".") for e in cext]
            if cdd and default_dialect is None:
                # dialect default applies only to files carrying the
                # configured extension (extension-mismatch → no dialect)
                if pos[0].startswith("$TMP/"):
                    skey0 = pos[0][5:]
                elif pos[0] != "-" and not pos[0].startswith(("$", "/")):
                    skey0 = cwd + (pos[0][2:] if pos[0].startswith("./")
                                   else pos[0])
                else:
                    skey0 = ""
                if not cfg_ext or any(skey0.endswith("." + e)
                                      for e in cfg_ext):
                    default_dialect = cdd
            for ig in cfg.get("ignore") or []:
                ignores.append("$TMP/" + ig.lstrip("./"))
        except ValueError as e:
            return exp not in (0, 2), "reject", f"config: {e}"

    def tmpkey(name: str) -> str:
        if name.startswith("$TMP/"):
            return name[5:]
        if name in ("$TMP", "$TMP/"):
            return ""
        if not name.startswith(("$", "/", "<(", "-")):
            # relative path: the script cd'd into $TMP (pass_cwd.sh,
            # pass_*_relative.sh)
            rel = name[2:] if name.startswith("./") else name
            return cwd + rel
        raise Skip(f"non-tmp path {name}")

    def expand(name: str) -> list[str]:
        if name == "-":
            if stdin is None:
                raise Skip("stdin unavailable")
            return ["-"]
        key = tmpkey(name)
        if key in files:
            return [key]
        prefix = (key.rstrip("/") + "/") if key.rstrip("/") else ""
        subs = sorted(k for k in files
                      if k.startswith(prefix) and k != "-"
                      and not k.startswith("__psub_"))
        if subs:
            # directory scan: extension + ignore filters
            # (reference --extension/--ignore, src/input.h:243-270)
            want = exts or ["json", "yaml", "yml"]
            subs = [k for k in subs
                    if any(k.endswith("." + e) for e in want)
                    or ("" in want and "." not in k.rsplit("/", 1)[-1])]
            subs = [k for k in subs
                    if not any(k == tmpkey(ig) or
                               k.startswith(tmpkey(ig).rstrip("/") + "/")
                               for ig in ignores)]
            return subs
        if created is not None and key not in created and not any(
                c.startswith(key.rstrip("/") + "/") for c in created):
            # the script never writes this path: a nonexistent input
            # (reference exit 6, e.g. fail_nonexistent_*.sh)
            raise FileNotFoundError(key)
        raise Skip(f"file {key} not from a heredoc")

    reject = None
    try:
        skey = expand(pos[0])[0]
        schema = _load_doc(files, skey)[0]
        if default_dialect and isinstance(schema, dict):
            schema.setdefault("$schema", default_dialect)
        if isinstance(schema, dict) and "$schema" not in schema:
            # the validate verb requires a determinable dialect
            # (SchemaUnknownBaseDialectError, exit 4)
            raise ValueError("could not determine the base dialect")
        # --resolve of a missing path: reference exits 6; we reject too
        for r in resolves:
            k = tmpkey(r)
            if k not in files and not any(
                    f.startswith(k.rstrip("/") + "/") for f in files):
                raise FileNotFoundError(k)
        # the CLI resolves sibling files from disk; give the library
        # replay the same filesystem view as an external registry
        inst_keys = set()
        for inst in pos[1:]:
            try:
                inst_keys.update(expand(inst))
            except Skip:
                pass
        resolve_keys = set()
        for r in resolves:
            try:
                resolve_keys.update(expand(r))
            except Skip:
                pass
        resources = {}
        for rk in sorted(files):
            if rk == skey or rk in inst_keys or rk == "jsonschema.json":
                continue
            if not rk.endswith((".json", ".yaml", ".yml")) \
                    and rk not in resolve_keys:
                continue
            try:
                rdoc = _load_doc(files, rk)[0]
            except Exception:
                if any(rk in expand(r) for r in resolves):
                    raise
                continue
            resources[rk] = rdoc
            resources["./" + rk] = rdoc
        if "jsonschema.json" in files:   # resolve-remap config entries
            try:
                cfg = json.loads(files["jsonschema.json"])
            except Exception:
                cfg = {}
            for src_uri, dst_uri in (cfg.get("resolve") or {}).items():
                for d in list(resources.values()):
                    if isinstance(d, dict) \
                            and (d.get("$id") or d.get("id")) == dst_uri:
                        resources[src_uri] = d
        cs = compile_schema(schema, assert_formats=fassert,
                            entrypoint=entry,
                            resources=resources or None)
        ok = True
        for inst in pos[1:]:
            for key in expand(inst):
                for doc in _load_doc(files, key):
                    if not cs.is_valid(doc):
                        ok = False
    except Skip:
        raise
    except Exception as e:   # noqa: BLE001 — any rejection is the signal
        reject = f"{type(e).__name__}: {e}"
    if reject is not None:
        return exp not in (0, 2), "reject", reject
    got = 0 if ok else 2
    return got == exp, got, None


def test_reference_validate_corpus_parity():
    scripts = sorted(glob.glob(f"{CORPUS}/*.sh"))
    assert len(scripts) > 200, "reference corpus missing?"
    matches, skips, divergent = [], {}, {}
    for path in scripts:
        name = path.rsplit("/", 1)[1]
        files, invs, created = _parse(path)
        if not invs:
            skips[name] = "no validate invocation"
            continue
        try:
            outs = [_replay_one(files, inv, exp, stdin, created, cwd)
                    for inv, exp, stdin, cwd in invs]
        except Skip as s:
            skips[name] = str(s)
            continue
        bad = [o for o in outs if not o[0]]
        if bad:
            divergent[name] = bad[0][1:]
        else:
            matches.append(name)

    unexpected = set(divergent) - EXPECTED_DIVERGENT
    healed = EXPECTED_DIVERGENT - set(divergent) - set(skips)
    assert not unexpected, f"new divergences: " \
        f"{ {k: divergent[k] for k in sorted(unexpected)} }"
    assert not healed, (f"now agreeing — remove from EXPECTED_DIVERGENT: "
                        f"{sorted(healed)}")
    assert len(matches) >= MIN_MATCHES, (
        f"parity regressed: {len(matches)} < {MIN_MATCHES}; "
        f"skips={len(skips)} divergent={len(divergent)}")


# ---------------------------------------------------------------------------
# metaschema verb corpus: fixtures executed VERBATIM via a CLI shim —
# byte-exact validation failure blocks (messages, instance positions,
# evaluate paths), Standard Basic --json documents with annotations,
# instruction traces, error text, exit codes.
# ---------------------------------------------------------------------------

META_MIN_MATCHES = 51   # the ENTIRE corpus


def test_reference_metaschema_corpus_parity(tmp_path):
    """Execute the reference's metaschema fixtures VERBATIM. Fixture
    source: /root/reference/test/metaschema/*.sh — PUBLIC CONTENT,
    executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/metaschema/*.sh"))
    assert scripts, "metaschema corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"metaschema fixture failures: {failed}"
    assert len(results) - len(failed) >= META_MIN_MATCHES


VALIDATE_E2E_MIN_MATCHES = 223   # the ENTIRE corpus, executed VERBATIM


def test_reference_validate_corpus_end_to_end(tmp_path):
    """Execute the reference's validate fixtures VERBATIM through the
    CLI shim — byte-exact outputs, exit codes, stdin/pipes/heredocs.
    Fixture source: /root/reference/test/validate/*.sh — PUBLIC
    CONTENT, executed for expected-output comparison only. Runs under
    bash (pass_process_substitution.sh uses <(...))."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob(f"{CORPUS}/*.sh"))
    assert len(scripts) >= 223, "validate corpus missing"

    def run(path):
        r = subprocess.run(["bash", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=180)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert len(results) - len(failed) >= VALIDATE_E2E_MIN_MATCHES, \
        f"validate e2e failures: {failed}"

# ---------------------------------------------------------------------------
# lint verb corpus: the ENTIRE fixture set executed VERBATIM through the
# CLI shim — byte-exact findings/positions, --fix rewrites + progress
# dots, --list, --json documents, custom rules, config flows, the typed
# error surface (spec/lintrules.py + spec/lint_cli.py).
# ---------------------------------------------------------------------------

LINT_E2E_MIN_MATCHES = 193   # the ENTIRE corpus, executed VERBATIM


def test_reference_lint_corpus_end_to_end(tmp_path):
    """Execute the reference's lint fixtures VERBATIM through the CLI
    shim. Fixture source: /root/reference/test/lint/*.sh — PUBLIC
    CONTENT, executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/lint/*.sh"))
    assert len(scripts) >= 193, "lint corpus missing"

    def run(path):
        r = subprocess.run(["bash", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=180)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert len(results) - len(failed) >= LINT_E2E_MIN_MATCHES, \
        f"lint e2e failures: {failed}"


# ---------------------------------------------------------------------------
# fmt verb corpus: BYTE-exact comparison where the fixture carries an
# expected.json (canonical keyword reordering + 2-space prettify), and
# --check verdict parity elsewhere. In-place rewrites are tracked so a
# later --check in the same script sees the formatted file.
# ---------------------------------------------------------------------------

FMT_MIN_MATCHES = 67   # the ENTIRE corpus, executed VERBATIM


def test_reference_fmt_corpus_parity(tmp_path):
    """Execute the reference's fmt fixtures VERBATIM (self-contained sh
    scripts asserting byte-exact formatted files, stdout/stderr text,
    and exit codes) against this engine's CLI via a `$1` shim. Fixture
    source: /root/reference/test/format/*.sh — PUBLIC CONTENT, executed
    for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/format/*.sh"))
    assert scripts, "fmt corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"fmt fixture failures: {failed}"
    assert len(results) - len(failed) >= FMT_MIN_MATCHES
# ---------------------------------------------------------------------------
# bundle verb corpus: fixtures executed VERBATIM via a CLI shim —
# byte-exact bundled output, error text, exit codes, and the fmt
# --check round-trip each script performs.
# ---------------------------------------------------------------------------

BUNDLE_MIN_MATCHES = 49   # the ENTIRE corpus


def test_reference_bundle_corpus_parity(tmp_path):
    """Execute the reference's bundle fixtures VERBATIM. Fixture
    source: /root/reference/test/bundle/*.sh — PUBLIC CONTENT, executed
    for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/bundle/*.sh"))
    assert scripts, "bundle corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"bundle fixture failures: {failed}"
    assert len(results) - len(failed) >= BUNDLE_MIN_MATCHES


# ---------------------------------------------------------------------------
# upgrade verb corpus: fixtures executed VERBATIM via a CLI shim —
# byte-exact upgraded output per pairwise target, error text, exit
# codes.
# ---------------------------------------------------------------------------

UPGRADE_MIN_MATCHES = 40   # the ENTIRE corpus


def test_reference_upgrade_corpus_parity(tmp_path):
    """Execute the reference's upgrade fixtures VERBATIM. Fixture
    source: /root/reference/test/upgrade/*.sh — PUBLIC CONTENT,
    executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/upgrade/*.sh"))
    assert scripts, "upgrade corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"upgrade fixture failures: {failed}"
    assert len(results) - len(failed) >= UPGRADE_MIN_MATCHES

# ---------------------------------------------------------------------------
# test verb corpus: the ENTIRE fixture set executed VERBATIM through the
# CLI shim — byte-exact PASS/FAIL reports, SimpleOutput failure blocks,
# rdf expectation errors, CTRF --json documents, the TestParseError
# surface (spec/test_cli.py).
# ---------------------------------------------------------------------------

TESTVERB_E2E_MIN_MATCHES = 111   # the ENTIRE corpus, executed VERBATIM


def test_reference_testverb_corpus_end_to_end(tmp_path):
    """Execute the reference's test-verb fixtures VERBATIM through the
    CLI shim. Fixture source: /root/reference/test/test/*.sh — PUBLIC
    CONTENT, executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/test/*.sh"))
    assert len(scripts) >= 111, "test corpus missing"

    def run(path):
        r = subprocess.run(["bash", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=180)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert len(results) - len(failed) >= TESTVERB_E2E_MIN_MATCHES, \
        f"test-verb e2e failures: {failed}"


# ---------------------------------------------------------------------------
# compile verb corpus: the ENTIRE fixture set executed VERBATIM through
# the CLI shim — byte-exact blaze Template JSON dumps (exhaustive/fast/
# minify/--include headers/entrypoints), templates re-executed through
# the blaze JavaScript port under node, the typed error surface
# (spec/compile_cli.py + spec/compile_template.py).
# ---------------------------------------------------------------------------

COMPILE_E2E_MIN_MATCHES = 47   # the ENTIRE corpus, executed VERBATIM


def test_reference_compile_corpus_end_to_end(tmp_path):
    """Execute the reference's compile fixtures VERBATIM through the
    CLI shim. Fixture source: /root/reference/test/compile/*.sh —
    PUBLIC CONTENT, executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/compile/*.sh"))
    assert len(scripts) >= 47, "compile corpus missing"

    def run(path):
        r = subprocess.run(["bash", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=180)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert len(results) - len(failed) >= COMPILE_E2E_MIN_MATCHES, \
        f"compile e2e failures: {failed}"


# ---------------------------------------------------------------------------
# inspect verb corpus: fixtures executed VERBATIM via a CLI shim —
# byte-exact frame dumps (text + JSON), error text, exit codes.
# ---------------------------------------------------------------------------

INSPECT_MIN_MATCHES = 39   # the ENTIRE corpus


def test_reference_inspect_corpus_parity(tmp_path):
    """Execute the reference's inspect fixtures VERBATIM. Fixture
    source: /root/reference/test/inspect/*.sh — PUBLIC CONTENT,
    executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/inspect/*.sh"))
    assert scripts, "inspect corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"inspect fixture failures: {failed}"
    assert len(results) - len(failed) >= INSPECT_MIN_MATCHES

# ---------------------------------------------------------------------------
# codegen verb corpus: fixtures executed VERBATIM via a CLI shim —
# byte-exact TypeScript output, error text, exit codes.
# ---------------------------------------------------------------------------

CODEGEN_MIN_MATCHES = 33   # the ENTIRE corpus


def test_reference_codegen_corpus_parity(tmp_path):
    """Execute the reference's codegen fixtures VERBATIM. Fixture
    source: /root/reference/test/codegen/*.sh — PUBLIC CONTENT,
    executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/codegen/*.sh"))
    assert scripts, "codegen corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"codegen fixture failures: {failed}"
    assert len(results) - len(failed) >= CODEGEN_MIN_MATCHES

# ---------------------------------------------------------------------------
# rdf verb corpus: the ENTIRE fixture set executed VERBATIM through the
# CLI shim — byte-exact expanded/flattened/compacted documents, the
# enriched JSON-LD resolution-error surface, validation failures,
# stdin/config/dialect flows (spec/rdf_cli.py).
# ---------------------------------------------------------------------------

RDF_E2E_MIN_MATCHES = 79   # the ENTIRE corpus, executed VERBATIM


def test_reference_rdf_corpus_end_to_end(tmp_path):
    """Execute the reference's rdf fixtures VERBATIM through the CLI
    shim. Fixture source: /root/reference/test/rdf/*.sh — PUBLIC
    CONTENT, executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob("/root/reference/test/rdf/*.sh"))
    assert len(scripts) >= 79, "rdf corpus missing"

    def run(path):
        r = subprocess.run(["bash", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=180)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert len(results) - len(failed) >= RDF_E2E_MIN_MATCHES, \
        f"rdf e2e failures: {failed}"


# ---------------------------------------------------------------------------
# rdf verb corpus: BYTE-exact expanded/flattened/compacted JSON-LD
# (x-jsonld-* annotation vocabulary with evaluation-driven
# composition), failure verdicts for resolution strictness.
# ---------------------------------------------------------------------------

RDF_MIN_MATCHES = 68
RDF_EXPECTED_DIVERGENT: set[str] = set()


def test_reference_rdf_corpus_parity():
    import difflib

    from jsonschema_ray.spec.format import prettify_json
    from jsonschema_ray.spec.jsonld import promote

    RP = '$(realpath "$TMP")'
    match, skip, div = [], {}, {}
    for path in sorted(glob.glob("/root/reference/test/rdf/*.sh")):
        name = path.rsplit("/",1)[1]
        src = open(path).read()
        if "config" in name: skip[name] = "project-config flow"; continue
        files = {m.group(1): m.group(2).replace(RP, "/TMP").replace("\\$","$")
                 for m in HEREDOC.finditer(src)}
        joined, buf = [], ""
        for ln in src.split("\n"):
            if ln.rstrip().endswith("\\"): buf += ln.rstrip()[:-1] + " "
            else: joined.append(buf + ln); buf = ""
        invs = []
        for i, ln in enumerate(joined):
            if '"$1"' in ln and " rdf" in ln:
                exp = 0
                for la in joined[i:i+4]:
                    m = re.search(r'test "\$EXIT_CODE" = "(\d+)"', la)
                    if m: exp = int(m.group(1)); break
                invs.append((ln.strip(), exp))
        if not invs: skip[name] = "no invocation"; continue
        verdict = None
        for inv, exp in invs:
            if "|" in inv.split('"$1"')[0] or not inv.lstrip().startswith('"$1"'):
                verdict = ("skip", "stdin/pipe"); break
            inv2 = re.split(r"\s(?:&&|\|\|)\s", inv)[0]
            out_redir = re.search(r'[^2]>\s*"\$TMP/([^"]+)"', inv2)
            inv2 = re.sub(r"\s[12]?>>?\s*\S+", "", inv2)
            try: toks = [t.replace("\\$","$") for t in shlex.split(inv2)]
            except ValueError: verdict = ("skip","plumbing"); break
            resolves, pos, compact, fassert, flat = [], [], None, None, False
            j = 2; flagskip = None
            while j < len(toks):
                t = toks[j]
                if t in ("--resolve","-r"): resolves.append(toks[j+1]); j += 2
                elif t in ("--compact","-c"):
                    if j+1 >= len(toks) or toks[j+1].startswith("-"):
                        compact = "MISSING"; j += 1
                    else: compact = toks[j+1]; j += 2
                elif t in ("--format-assertion","-F"): fassert = True; j += 1
                elif t in ("--flatten","-l"): flat = True; j += 1
                elif t in ("--verbose","-v","--json","-j","--fast","-f"): j += 1
                elif t.startswith("-") and t != "-": flagskip = t; break
                else: pos.append(t); j += 1
            if flagskip: verdict = ("skip", f"flag {flagskip}"); break
            if compact == "MISSING":
                got = 1
                agree = exp not in (0, 2)
                if not agree: verdict = ("div", (exp, got))
                if verdict: break
                continue
            if len(pos) < 2 or "-" in pos: verdict = ("skip","needs schema+instance/stdin"); break
            if len(pos) > 2:
                got = 1   # too many positionals: CLI arg error (exit 5)
                agree = exp not in (0, 2)
                if not agree: verdict = ("div", (exp, got))
                if verdict: break
                continue
            def load(k):
                body = files[k]
                try: return json.loads(body)
                except Exception:
                    import yaml
                    return yaml.safe_load(body)
            got, out = None, None
            if "jsonschema.json" in files:
                pass  # remap handled after registry build
            skey, ikey = pos[0][5:] if pos[0].startswith("$TMP/") else pos[0], pos[1][5:] if pos[1].startswith("$TMP/") else pos[1]
            if skey not in files or ikey not in files:
                got = 1  # enoent cases (reference exits nonzero)
            reg = {}
            if got is None:
                for r in resolves:
                    rk = r[5:] if r.startswith("$TMP/") else r
                    sub = [k for k in files if k == rk or k.startswith(rk.rstrip("/")+"/")]
                    if not sub: got = 1; break
                    for k in sorted(sub):
                        try: doc = load(k)
                        except Exception: got = 1; break
                        reg[k] = doc; reg["./"+k] = doc
                        if isinstance(doc, dict):
                            did = doc.get("$id") or doc.get("id")
                            if isinstance(did, str): reg.setdefault(did, doc)
                    if got: break
            if got is None and "jsonschema.json" in files:
                try: cfg = json.loads(files["jsonschema.json"])
                except Exception: cfg = {}
                for s_uri, d_uri in (cfg.get("resolve") or {}).items():
                    tdoc = next((d for d in reg.values() if isinstance(d, dict)
                                 and (d.get("$id") or d.get("id")) == d_uri), None)
                    if tdoc is not None: reg[s_uri] = tdoc
            if got is None:
                try:
                    schema = load(skey); inst = load(ikey)
                except Exception: got = 1
            if got is None:
                try:
                    res = promote(schema, inst, resources=reg or None,
                                  assert_formats=fassert)
                    if flat:
                        from jsonschema_ray.spec.jsonld import flatten
                        res = flatten(res)
                    if compact is not None:
                        ck = compact[5:] if compact.startswith("$TMP/") else compact
                        if ck not in files: raise FileNotFoundError(ck)
                        from jsonschema_ray.spec.jsonld import compact as _c
                        res = _c(res, load(ck))
                    out = prettify_json(res) + "\n"
                    got = 0
                except Exception as e:
                    msg = str(e)
                    got = 2 if "does not match the schema" in msg else 1
            agree = (got == exp) or (exp not in (0,2) and got in (1,2))
            if not agree: verdict = ("div", (exp, got)); break
            if got == 0 and out_redir and "expected.json" in files:
                want = files["expected.json"] + "\n"
                if out != want:
                    d = "".join(difflib.unified_diff(want.splitlines(True), out.splitlines(True)))[:500]
                    verdict = ("div", ("bytes", d)); break
        if verdict is None: match.append(name)
        elif verdict[0]=="skip": skip[name]=verdict[1]
        else: div[name]=verdict[1]
    
    unexpected = set(div) - RDF_EXPECTED_DIVERGENT
    healed = RDF_EXPECTED_DIVERGENT - set(div) - set(skip)
    assert not unexpected, f"new rdf divergences: " \
        f"{ {k: div[k] for k in sorted(unexpected)} }"
    assert not healed, f"update RDF_EXPECTED_DIVERGENT: {sorted(healed)}"
    assert len(match) >= RDF_MIN_MATCHES, (
        f"{len(match)} < {RDF_MIN_MATCHES}; skips={skip}")


# ----------------------------------------------------------------- install

INSTALL_CORPUS = "/root/reference/test/install"
INSTALL_MIN_MATCHES = 79   # all fixtures; ratchet


def test_reference_install_corpus_parity(tmp_path):
    """Execute the reference's install fixtures VERBATIM (they are
    self-contained POSIX sh scripts asserting byte-exact CLI output,
    lock-file contents and vendored-schema bytes) against this
    engine's CLI via a `$1` shim. Fixture source:
    /root/reference/test/install/*.sh — PUBLIC CONTENT, executed for
    expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(glob.glob(f"{INSTALL_CORPUS}/*.sh"))
    assert scripts, "install corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 1)[-1], r.returncode,
                (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"install fixture failures: {failed}"
    assert len(results) - len(failed) >= INSTALL_MIN_MATCHES


# ----------------------------------------------------------- encode/decode

CODEC_CORPORA = ["/root/reference/test/encode", "/root/reference/test/decode"]
CODEC_MIN_MATCHES = 10   # all fixtures; ratchet


def test_reference_encode_decode_corpus_parity(tmp_path):
    """Execute the reference's encode/decode fixtures VERBATIM (they
    assert byte-exact JSON BinPack v1 output via xxd plus the exact
    size/ratio/verbose text) against this engine's CLI via a `$1`
    shim. Fixture source: /root/reference/test/{encode,decode}/*.sh —
    PUBLIC CONTENT, executed for expected-output comparison only."""
    import concurrent.futures as cf
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "jsr"
    shim.write_text("#!/bin/sh\n"
                    f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                    '-m jsonschema_ray "$@"\n')
    shim.chmod(0o755)
    scripts = sorted(s for d in CODEC_CORPORA
                     for s in glob.glob(f"{d}/*.sh"))
    assert scripts, "encode/decode corpus missing"

    def run(path):
        r = subprocess.run(["sh", path, str(shim)], cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        return (path.rsplit("/", 2)[-2] + "/" + path.rsplit("/", 1)[-1],
                r.returncode, (r.stdout + r.stderr)[-400:])

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, scripts))
    failed = {n: out for n, rc, out in results if rc != 0}
    assert not failed, f"encode/decode fixture failures: {failed}"
    assert len(results) - len(failed) >= CODEC_MIN_MATCHES
