"""SnapshotStore — Parquet tables with Iceberg-style atomic snapshots.

The Iceberg runtime jar is not resolvable offline in this sandbox
(SURVEY.md §7), so this store preserves the semantics the engine needs
from Iceberg — atomic multi-table commits, snapshot isolation, exact
resume after a kill — over plain Parquet + JSON manifests:

* Every table is a list of immutable Parquet **segments**.
* A **manifest** ``_manifests/v<NNNNNN>.json`` pins the exact segment
  list of every table plus commit metadata. Writing it is a tmp-file +
  ``os.rename`` — the single atomic commit point.
* ``append`` stages new segments; ``replace`` stages a compaction;
  nothing becomes visible until ``commit()``. A crash mid-round leaves
  orphan segment dirs that no manifest references — ignored on resume
  and removed by ``gc()``.

This mirrors the reference's durability contract: darc's queues live in
Redis/RDBMS and workers are stateless (``darc/process.py``), so a killed
worker resumes from queue state; here a killed run resumes from the last
committed manifest (north rule: checkpointed state, exact resume).

Scale notes: segments written by the engine are hash-distributed on the
table's key (bucket column) before write, so per-bucket operations prune
to matching files; the manifest records per-segment row counts for
observability. Swapping this class for real Iceberg tables is a drop-in
(append → MERGE/append, commit → snapshot commit) behind the same API.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from darc_spark import schema as table_schemas

_MANIFEST_RE = re.compile(r"^v(\d{6})\.json$")


class SnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schemas: dict[str, T.StructType] | None = None,
    ) -> None:
        self.spark = spark
        self.root = os.path.abspath(root)
        self._base_schemas = dict(schemas or table_schemas.TABLES)
        self.schemas = dict(self._base_schemas)
        os.makedirs(os.path.join(self.root, "_manifests"), exist_ok=True)
        self.version, self._tables = self._load_latest()
        # evolved-schema map (table → StructType JSON doc), carried in
        # FULL on every manifest (like round_ts) so resume and
        # expire_snapshots never lose it
        self._evolved: dict[str, Any] = {}
        if self.version:
            try:
                self._evolved = dict(
                    self._manifest_doc(self.version).get("schemas", {})
                )
            except KeyError:  # pragma: no cover - latest always retained
                pass
            for t, sj in self._evolved.items():
                self.schemas[t] = T.StructType.fromJson(sj)
        self.meta: dict[str, Any] = {}
        # staged (uncommitted) changes: table -> list of segment relpaths
        self._staged_appends: dict[str, list[str]] = {}
        self._staged_replace: dict[str, list[str]] = {}
        # staged schema evolutions: table -> schema BEFORE evolve()
        self._staged_prior_schemas: dict[str, T.StructType] = {}
        # deferred (not yet materialized) appends: rel -> lazy DataFrame
        self._pending_writes: dict[str, DataFrame] = {}
        self._seg_counter = 0

    # -- manifest handling -------------------------------------------------
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def _load_latest(self) -> tuple[int, dict[str, list[str]]]:
        best, tables = 0, {}
        for fn in os.listdir(self._manifest_dir()):
            m = _MANIFEST_RE.match(fn)
            if not m:
                continue
            v = int(m.group(1))
            if v <= best:
                continue
            try:
                with open(os.path.join(self._manifest_dir(), fn)) as f:
                    doc = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # torn write of a newer manifest → previous wins
            best, tables = v, doc["tables"]
        return best, tables

    def latest_meta(self) -> dict[str, Any]:
        if self.version == 0:
            return {}
        with open(os.path.join(self._manifest_dir(), f"v{self.version:06d}.json")) as f:
            return json.load(f).get("meta", {})

    def snapshots(self) -> list[int]:
        """Retained snapshot versions, ascending (Iceberg: snapshot log)."""
        out = []
        for fn in os.listdir(self._manifest_dir()):
            m = _MANIFEST_RE.match(fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _manifest_doc(self, version: int) -> dict[str, Any]:
        path = os.path.join(self._manifest_dir(), f"v{version:06d}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            raise KeyError(f"no retained snapshot v{version}") from e

    def tables_at(self, version: int) -> dict[str, list[str]]:
        """The exact table→segments pin of snapshot ``version``."""
        return self._manifest_doc(version)["tables"]

    def meta_at(self, version: int) -> dict[str, Any]:
        """Snapshot ``version``'s commit metadata."""
        return self._manifest_doc(version).get("meta", {})

    # -- reads ---------------------------------------------------------------
    def segments(self, table: str) -> list[str]:
        return list(self._tables.get(table, []))

    def version_token(self, table: str) -> tuple:
        """Hashable identity of the table's visible segment set
        (committed + staged) — a cache key for derived artifacts
        (e.g. a broadcast of the filter payloads) that must be rebuilt
        exactly when the table changes."""
        schema = self.schemas.get(table)
        return (
            tuple(self._tables.get(table, ())),
            tuple(self._staged_appends.get(table, ())),
            tuple(self._staged_replace.get(table, ())),
            None if schema is None else tuple(f.name for f in schema.fields),
        )

    def schema_at(self, table: str, version: int) -> T.StructType | None:
        """The schema of ``table`` as of snapshot ``version`` — the
        version's recorded evolution if any, else the base registry
        (Iceberg: each snapshot references its schema-id)."""
        sj = self._manifest_doc(version).get("schemas", {}).get(table)
        if sj is not None:
            return T.StructType.fromJson(sj)
        return self._base_schemas.get(table)

    def read_at(self, table: str, version: int) -> DataFrame:
        """Time-travel read: ``table`` exactly as of snapshot ``version``
        (Iceberg ``VERSION AS OF``) — including its THEN-current schema:
        columns added later do not appear. Works for any retained
        snapshot — segments are immutable and stay on disk until the
        snapshot is expired (:meth:`expire_snapshots`) and swept
        (:meth:`gc`)."""
        segs = self.tables_at(version).get(table, [])
        return self._read_segments(
            table, segs, schema=self.schema_at(table, version)
        )

    def read(self, table: str) -> DataFrame:
        """Snapshot read: union of the committed segments of ``table``."""
        return self._read_segments(table, self.segments(table))

    def _read_segments(
        self,
        table: str,
        segs: list[str],
        schema: T.StructType | None = None,
    ) -> DataFrame:
        schema = schema if schema is not None else self.schemas.get(table)
        if not segs:
            if schema is None:
                raise KeyError(f"unknown empty table {table!r} (no schema declared)")
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, s) for s in segs]
        reader = self.spark.read
        if schema is not None:
            # explicit schema: columns an old segment predates read as
            # null — the add-column evolution contract
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    # -- writes (staged until commit) ----------------------------------------
    def _new_segment(self, table: str, df: DataFrame) -> str:
        self._seg_counter += 1
        rel = os.path.join(table, f"seg-{self.version + 1:06d}-{self._seg_counter:04d}")
        df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        return rel

    def append(self, table: str, df: DataFrame, defer: bool = True) -> None:
        """Stage an append. By default the write is DEFERRED: independent
        segment writes accumulate and materialize concurrently at
        ``commit()`` (Spark schedules jobs from multiple driver threads in
        parallel) — one round's many small table appends overlap instead
        of running serially. ``read_all``/``ensure_written`` force any
        deferred write their reader depends on.
        """
        if defer:
            self._seg_counter += 1
            rel = os.path.join(
                table, f"seg-{self.version + 1:06d}-{self._seg_counter:04d}"
            )
            self._pending_writes[rel] = df
        else:
            rel = self._new_segment(table, df)
        self._staged_appends.setdefault(table, []).append(rel)

    def ensure_written(self, table: str | None = None, parallel: bool = True) -> None:
        """Materialize deferred appends (all, or one table's)."""
        todo = [
            (rel, df)
            for rel, df in self._pending_writes.items()
            if table is None or rel.split(os.sep)[0] == table
        ]
        if not todo:
            return
        if parallel and len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def write(item):
                rel, df = item
                df.write.mode("overwrite").parquet(os.path.join(self.root, rel))

            with ThreadPoolExecutor(max_workers=min(8, len(todo))) as ex:
                list(ex.map(write, todo))  # propagate exceptions
        else:
            for rel, df in todo:
                df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        for rel, _ in todo:
            del self._pending_writes[rel]

    def evolve(self, table: str, new_schema: T.StructType) -> None:
        """Stage an add-column schema evolution (Iceberg ``ALTER TABLE
        ADD COLUMN``): every existing column must keep its name and
        type, new columns must be nullable (old segments read them as
        null — no data rewrite). Takes effect immediately for this
        round's reads/writes and is published by the next
        :meth:`commit`; :meth:`rollback` reverts it."""
        cur = self.schemas.get(table)
        if cur is None:
            raise KeyError(f"unknown table {table!r}")
        new_fields = {f.name: f for f in new_schema.fields}
        for f in cur.fields:
            nf = new_fields.get(f.name)
            if nf is None:
                raise ValueError(
                    f"evolution cannot drop column {table}.{f.name}"
                )
            if nf.dataType != f.dataType:
                raise ValueError(
                    f"evolution cannot change type of {table}.{f.name}: "
                    f"{f.dataType.simpleString()} → "
                    f"{nf.dataType.simpleString()}"
                )
        existing = {f.name for f in cur.fields}
        for f in new_schema.fields:
            if f.name not in existing and not f.nullable:
                raise ValueError(
                    f"new column {table}.{f.name} must be nullable "
                    "(old segments have no values for it)"
                )
        self._staged_prior_schemas.setdefault(table, cur)
        self.schemas[table] = new_schema

    def replace(self, table: str, df: DataFrame, drop_staged: bool = False) -> None:
        """Stage a compaction: ``df`` becomes the table's only segment.

        By default, appends already staged this round still ride on top
        of the replacement at commit (Frontier.compact relies on this:
        its replacement is derived from the committed snapshot). With
        ``drop_staged=True`` the replacement also supersedes this
        round's staged appends — required when the replacement was
        derived from ``read_all`` (which already folded the staged rows
        in), so commit does not re-apply them as duplicates.
        """
        rel = self._new_segment(table, df)
        self._staged_replace[table] = [rel]
        if drop_staged:
            for seg in self._staged_appends.pop(table, []):
                self._pending_writes.pop(seg, None)

    def commit(self, meta: dict[str, Any] | None = None) -> int:
        """Atomically publish all staged changes as one new snapshot."""
        self.ensure_written()  # concurrent materialization of deferred appends
        new_tables = {t: list(segs) for t, segs in self._tables.items()}
        for table, segs in self._staged_replace.items():
            new_tables[table] = list(segs)
        for table, segs in self._staged_appends.items():
            new_tables.setdefault(table, [])
            new_tables[table].extend(segs)
        for table in self._staged_prior_schemas:
            self._evolved[table] = self.schemas[table].jsonValue()
        new_version = self.version + 1
        doc = {"version": new_version, "tables": new_tables, "meta": meta or {}}
        if self._evolved:
            doc["schemas"] = self._evolved
        final = os.path.join(self._manifest_dir(), f"v{new_version:06d}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the atomic commit point
        self.version, self._tables = new_version, new_tables
        self._staged_appends.clear()
        self._staged_replace.clear()
        self._staged_prior_schemas.clear()
        return new_version

    def rollback_to(self, version: int) -> int:
        """Roll back to snapshot ``version`` by committing a NEW snapshot
        that pins that version's segment lists (Iceberg rollback: history
        only moves forward, data files are reused, the bad snapshots stay
        readable until expired). Discards anything staged.

        The target snapshot's crawl-cursor meta (``round``/``ts``) is
        carried forward: a Crawler resumed on the rolled-back store must
        continue from the rolled-back round, not restart at round 0
        against frontier state whose leases point near the old round.
        """
        tables = self.tables_at(version)  # KeyError if expired/unknown
        old_meta = self.meta_at(version)
        meta = {"op": "rollback", "to": version}
        for k in ("round", "ts"):
            if k in old_meta:
                meta[k] = old_meta[k]
        self.rollback()
        self._tables = {t: list(s) for t, s in tables.items()}
        # pin the target snapshot's schemas too (an evolution after
        # ``version`` is part of what is being rolled back)
        self._evolved = dict(
            self._manifest_doc(version).get("schemas", {})
        )
        self.schemas = dict(self._base_schemas)
        for t, sj in self._evolved.items():
            self.schemas[t] = T.StructType.fromJson(sj)
        return self.commit(meta)

    def rollback(self) -> None:
        """Discard staged (uncommitted) segments and schema changes."""
        self._pending_writes.clear()
        for segs in list(self._staged_appends.values()) + list(
            self._staged_replace.values()
        ):
            for rel in segs:
                shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        self._staged_appends.clear()
        self._staged_replace.clear()
        for table, prior in self._staged_prior_schemas.items():
            self.schemas[table] = prior
        self._staged_prior_schemas.clear()

    def read_all(self, table: str) -> DataFrame:
        """Snapshot read PLUS this round's staged (uncommitted) segments.

        Needed where within-round read-your-writes matters, e.g. the
        URL-seen NX check across multiple enqueues in one round.
        """
        self.ensure_written(table)
        committed = self.read(table)
        staged = self._staged_appends.get(table, [])
        if self._staged_replace.get(table):
            committed = self.spark.read.schema(
                self.schemas[table]
            ).parquet(
                *[os.path.join(self.root, s) for s in self._staged_replace[table]]
            )
        if not staged:
            return committed
        staged_df = self.spark.read.schema(self.schemas[table]).parquet(
            *[os.path.join(self.root, s) for s in staged]
        )
        return committed.unionByName(staged_df)

    def write_scratch(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize an intermediate once and read it back (cut-point).

        Used where one expensive result (e.g. a fetch batch) feeds several
        downstream writes — the re-read guarantees every consumer sees the
        same rows with no recomputation (and no non-determinism), like an
        Iceberg staging table. Scratch lives outside manifests and is
        overwritten per round.
        """
        path = os.path.join(self.root, "_scratch", name)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Delete manifests older than the newest ``keep_last`` snapshots
        (Iceberg ``expireSnapshots``). Returns the number expired.

        Expiry only removes MANIFESTS — data files a surviving snapshot
        still pins stay readable; a following :meth:`gc` sweeps segments
        no retained snapshot references. Split into two steps exactly so
        time-travel reads of retained snapshots can never break.
        """
        versions = self.snapshots()
        expired = 0
        for v in versions[: max(0, len(versions) - keep_last)]:
            if v == self.version:
                continue  # never expire the current snapshot
            os.remove(os.path.join(self._manifest_dir(), f"v{v:06d}.json"))
            expired += 1
        return expired

    def gc(self) -> int:
        """Remove segment dirs referenced by NO retained snapshot.

        Live = the union over ALL retained manifests (not just the
        current one): a replace-superseded segment stays on disk while
        an older snapshot still pins it, so time travel keeps working —
        run :meth:`expire_snapshots` first to release history.
        """
        live = {rel for segs in self._tables.values() for rel in segs}
        for v in self.snapshots():
            for segs in self.tables_at(v).values():
                live.update(segs)
        # this round's staged (uncommitted) segments are live too
        for staged in (self._staged_appends, self._staged_replace):
            for segs in staged.values():
                live.update(segs)
        removed = 0
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if table in ("_manifests", "_scratch") or not os.path.isdir(tdir):
                continue
            for seg in os.listdir(tdir):
                rel = os.path.join(table, seg)
                if rel not in live:
                    shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
                    removed += 1
        return removed
