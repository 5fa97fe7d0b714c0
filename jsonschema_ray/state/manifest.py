"""Checkpointed, resumable runs: per-shard lineage + metrics manifests.

North rule: "runs are checkpointed per partition with lineage + metrics
manifests so a killed ``ray job submit`` resumes without recomputing
validated partitions." The reference has no checkpointing (rerun is
cheap single-machine; only ``install`` writes a lock file,
``/root/reference/src/command_install.cc:388-465``) — at 10^12 docs this
is mandatory (SURVEY.md §4 "Checkpoint/resume").

Design: the run is sharded by **input** (groups of parquet fragments or
synth id-ranges). Each shard is validated as its own sub-pipeline and
its violations land in ``out/shard=<i>/`` with a ``manifest.json``
recording lineage (input files, plan hash, row/violation counts,
wall-time) and a ``_SUCCESS`` marker written last (write-then-rename
atomicity). Resume = skip shards whose manifest matches the current
plan hash; a changed plan invalidates all shards.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Sequence

SUCCESS = "_SUCCESS"
MANIFEST = "manifest.json"


@dataclass
class ShardManifest:
    shard: int
    inputs: list[str]
    plan_hash: str
    docs: int
    violations: int
    wall_sec: float

    def to_json(self) -> dict[str, Any]:
        return vars(self)


def shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard:05d}")


def is_complete(out_dir: str, shard: int, plan_hash: str) -> bool:
    d = shard_dir(out_dir, shard)
    if not os.path.exists(os.path.join(d, SUCCESS)):
        return False
    try:
        with open(os.path.join(d, MANIFEST)) as f:
            return json.load(f).get("plan_hash") == plan_hash
    except (OSError, json.JSONDecodeError):
        return False


def commit_shard(out_dir: str, manifest: ShardManifest) -> None:
    d = shard_dir(out_dir, manifest.shard)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest.to_json(), f, indent=1)
    os.replace(tmp, os.path.join(d, MANIFEST))
    with open(os.path.join(d, SUCCESS), "w") as f:
        f.write(str(time.time()))


def load_manifests(out_dir: str) -> list[dict[str, Any]]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name, MANIFEST)
        if name.startswith("shard=") and os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def plan_shards(paths: Sequence[str], shard_size: int) -> list[list[str]]:
    """Group input files into shards of ``shard_size`` files each,
    deterministically ordered (the reference sorts inputs by canonical
    path, ``/root/reference/src/input.h:463-505``)."""
    ordered = sorted(paths)
    return [list(ordered[i:i + shard_size])
            for i in range(0, len(ordered), shard_size)]


def scan_inputs(
    paths: Sequence[str],
    *,
    extensions: Sequence[str] | None = None,
    ignore: Sequence[str] = (),
) -> list[str]:
    """Recursive input scanner with extension + ignore filters — the
    reference's directory traversal semantics
    (``/root/reference/src/input.h:48-106`` parse_extensions,
    ``:109-122`` parse_ignore, ``:229-271`` handle_json_entry):

    - directories are walked recursively; files kept when they match an
      extension (default ``.json .yaml .yml``; an EMPTY extension means
      extensionless files) and are not under an ignored path prefix;
      empty files are skipped
    - explicitly-named files bypass the extension filter but still
      honor the ignore list
    - output is deterministically sorted (canonical path)
    """
    exts = set()
    for e in (extensions or []):
        exts.add(e if (e == "" or e.startswith(".")) else "." + e)
    if not exts:
        exts = {".json", ".yaml", ".yml"}
    blacklist = [os.path.realpath(p) for p in ignore]

    def ignored(p: str) -> bool:
        rp = os.path.realpath(p)
        return any(rp == b or rp.startswith(b + os.sep) for b in blacklist)

    def ext_match(p: str) -> bool:
        _, dot, tail = os.path.basename(p).rpartition(".")
        if "" in exts and not dot:
            return True
        return any(e != "" and p.endswith(e) for e in exts)

    out: list[str] = []
    for entry in paths:
        if os.path.isdir(entry):
            for root, dirs, files in os.walk(entry):
                dirs.sort()
                for name in sorted(files):
                    p = os.path.join(root, name)
                    if ext_match(p) and not ignored(p) \
                            and os.path.getsize(p) > 0:
                        out.append(p)
        elif not ignored(entry):
            out.append(entry)
    return sorted(out)
