"""Manifest-based snapshot versioning over plain parquet (S-family
maintenance, beyond the reference): the minimal lakehouse time-travel
pattern — Iceberg/Delta semantics with no table-format dependency.

Each commit writes NEW immutable data directories and then a manifest
(one JSON file per version) listing the complete directory set visible
at that version.  The manifest write is the atomic commit point:

* appends never rewrite or touch existing data files, so every
  historical version stays byte-identical and readable forever;
* a reader resolves ONE manifest and scans exactly that file set — it
  can never observe a half-committed version (the data write happens
  before the manifest exists) or a concurrent append (which only adds
  a manifest the reader did not resolve);
* at 100 TB this is the only write discipline that gives reproducible
  training runs: "train on snapshot v7" pins the exact file set, while
  a bare directory scan would silently absorb whatever landed since.

Reference analog: the store's save/load persistence (S1/S2,
``app/api/dependencies.py:36-67``) keeps only the LATEST state; this
keeps them all.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def list_versions(table_path: str) -> list[int]:
    """Committed versions, ascending (empty for a fresh table).

    Only exact ``v<digits>.json`` names count — a stray or hand-edited
    file in the manifest directory must not take reads down."""
    import re

    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(table_path: str, version: int) -> list[str]:
    with open(
        os.path.join(table_path, _MANIFEST_DIR, f"v{version}.json")
    ) as fh:
        return json.load(fh)["data_dirs"]


def commit_snapshot(df: DataFrame, table_path: str) -> int:
    """Append ``df`` as a new immutable version; returns the version.

    Data lands in a fresh ``batch-NNNNN-<uuid8>`` directory — the name
    is unique per commit attempt, so concurrent committers can never
    target (or stage inside) the same path, and ``mode="error"`` makes
    any residual collision loud.  The manifest is then written as the
    atomic commit point.  A commit that died between the data write
    and the manifest write leaves an ORPHAN directory no manifest
    references — harmless garbage (collectable as any dir not
    referenced by the latest manifest) that can never wedge a later
    retry, because the retry mints a fresh name.  The manifest
    carries the FULL directory list (previous version's set + the new
    directory), so resolving a version never walks a manifest chain.

    The manifest is created with an EXCLUSIVE primitive (``os.link``
    from a private tmp file — fails with EEXIST if the target exists,
    unlike ``os.rename`` which silently overwrites).  Two concurrent
    committers that both read latest=v1 therefore cannot both land
    v2.json: the loser re-reads the version list and retries with a
    bumped number, so both data directories end up referenced by SOME
    manifest and no commit is silently lost."""
    versions = list_versions(table_path)
    v = (versions[-1] + 1) if versions else 1
    # the data directory name is unique PER COMMIT ATTEMPT (Iceberg's
    # uuid-file-name discipline): two committers — threads of one
    # driver or separate processes — can never target the same path,
    # so there is no probe-then-write race and no shared ``_temporary``
    # staging dir to cross-delete (concurrent writers into ONE parquet
    # path corrupt each other's task staging even under mode("error")).
    # The version prefix is advisory readability only; the manifest,
    # not the name, decides membership.
    data_dir = f"batch-{v:05d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(os.path.join(table_path, data_dir))
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    while True:
        versions = list_versions(table_path)
        v = (versions[-1] + 1) if versions else 1
        dirs = (
            _read_manifest(table_path, versions[-1]) if versions else []
        ) + [data_dir]
        # tmp name must be unique PER ATTEMPT, not just per process:
        # two threads of one driver sharing a pid-only tmp path could
        # cross-publish each other's manifest content (one data_dir
        # then referenced by no manifest — a silently lost commit) and
        # the second os.link would raise FileNotFoundError instead of
        # taking the EEXIST retry path.  uuid4 makes every attempt's
        # staging file private; os.link stays the only commit point.
        tmp = os.path.join(
            mdir, f".v{v}.json.tmp-{os.getpid()}-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump({"version": v, "data_dirs": dirs}, fh)
        try:
            os.link(tmp, os.path.join(mdir, f"v{v}.json"))  # atomic commit
        except FileExistsError:
            os.remove(tmp)
            continue  # lost the race: re-read versions, bump, retry
        os.remove(tmp)
        return v


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Scan exactly the file set of ``version`` (default: latest).

    A plain multi-path parquet read — column pruning and predicate
    pushdown reach every file, and the scan parallelizes over the
    union of the version's directories like any other table."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"unknown snapshot version {v}; have {versions}")
    dirs = _read_manifest(table_path, v)
    return spark.read.parquet(
        *[os.path.join(table_path, d) for d in dirs]
    )
