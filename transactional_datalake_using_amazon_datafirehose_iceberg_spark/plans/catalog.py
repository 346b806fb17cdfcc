"""LakeCatalog — named-table warehouse (the Glue Data Catalog analogue).

Reference: Firehose routes each record to a Glue-cataloged
``(database, table)`` pair carried in its ``otfMetadata``
(cdk_stacks/firehose_to_iceberg.py:80-82, 109-116). Here a catalog is a
warehouse directory of LakeTables addressed as ``db.table``; creation is
idempotent like the runbook's ``CREATE ... IF NOT EXISTS``
(README.md:284-309).
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from .lake_table import LakeTable


class LakeCatalog:
    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    @staticmethod
    def _check_ident(name: str, kind: str) -> str:
        """Reject identifiers that escape the warehouse: table names are
        data-adjacent here (routed apply keys off metadata table-name,
        and the fixtures deliberately carry dirty names), so a '..' or
        separator-bearing name would create — or DROP — paths outside
        the warehouse root (review round 11). Dirty-but-contained names
        (leading spaces etc.) stay legal, matching transformer fidelity."""
        if (
            not name
            or name in (".", "..")
            or "/" in name
            or os.sep in name
            or (os.altsep and os.altsep in name)
            or "\x00" in name
        ):
            raise ValueError(f"illegal {kind} identifier: {name!r}")
        return name

    def _path(self, db: str, table: str) -> str:
        self._check_ident(db, "database")
        self._check_ident(table, "table")
        return os.path.join(self.warehouse, db, table)

    def create_database(self, db: str) -> None:
        self._check_ident(db, "database")
        os.makedirs(os.path.join(self.warehouse, db), exist_ok=True)

    def databases(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def tables(self, db: str) -> list[str]:
        base = os.path.join(self.warehouse, db)
        if not os.path.isdir(base):
            return []
        return sorted(t for t in os.listdir(base) if LakeTable.exists(os.path.join(base, t)))

    def create_table(
        self,
        db: str,
        table: str,
        schema: T.StructType,
        keys: list[str] | None = None,
        cluster_by: list[str] | None = None,
        if_not_exists: bool = True,
    ) -> LakeTable:
        from .lake_table import CommitConflict

        p = self._path(db, table)
        if LakeTable.exists(p):
            if if_not_exists:
                return LakeTable.load(p)
            raise ValueError(f"table {db}.{table} already exists")
        self.create_database(db)
        try:
            return LakeTable.create(p, schema, keys=keys, cluster_by=cluster_by)
        except CommitConflict:
            # exists-then-create is not atomic: a concurrent creator can
            # win between the check and the exclusive v0 publish. Under
            # IF NOT EXISTS the loser gets the winner's table back
            # (CREATE IF NOT EXISTS semantics — review round 11);
            # without it, surface the conflict.
            if if_not_exists and LakeTable.exists(p):
                return LakeTable.load(p)
            raise

    def load_table(self, db: str, table: str) -> LakeTable:
        return LakeTable.load(self._path(db, table))

    def drop_table(self, db: str, table: str) -> None:
        if LakeTable.exists(self._path(db, table)):
            LakeTable.load(self._path(db, table)).drop()
