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

    def _path(self, db: str, table: str) -> str:
        return os.path.join(self.warehouse, db, table)

    def create_database(self, db: str) -> None:
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
        p = self._path(db, table)
        if LakeTable.exists(p):
            if if_not_exists:
                return LakeTable.load(p)
            raise ValueError(f"table {db}.{table} already exists")
        self.create_database(db)
        return LakeTable.create(p, schema, keys=keys, cluster_by=cluster_by)

    def load_table(self, db: str, table: str) -> LakeTable:
        return LakeTable.load(self._path(db, table))

    def drop_table(self, db: str, table: str) -> None:
        if LakeTable.exists(self._path(db, table)):
            LakeTable.load(self._path(db, table)).drop()
