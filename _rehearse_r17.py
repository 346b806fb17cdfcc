"""Ad-hoc r17 driver-window rehearsal: run the EXACT 50-spec sampling
window (the registry prefix) against DuckDB at sf0.01, the comparison
the driver performs — rows, columns, order-insensitive 6-dp values."""
import datetime
import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (  # noqa: E402
    registry,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (  # noqa: E402
    FIXTURE_TABLES,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = "/root/testdata/sf0.01"


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return _norm(float(v))
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted(cols), out


spark = get_spark(app_name="rehearse_r17", master="local[32]",
                  shuffle_partitions=32)
con = duckdb.connect()
for t in FIXTURE_TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
    )

window = list(registry.QUERY_SPECS.values())[: registry.SAMPLING_WINDOW]
green = red = 0
for spec in window:
    try:
        sdf = spec.run_spark(spark, SF_DIR)
        sc, sr = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(spec.oracle_text())
        dc, dr = _normalize([d[0] for d in res.description], res.fetchall())
        ok = sc == dc and len(sr) == len(dr) and sr == dr
    except Exception as exc:
        print(f"ERR  {spec.name}: {type(exc).__name__}: {exc}")
        red += 1
        continue
    if ok:
        green += 1
    else:
        red += 1
        print(f"RED  {spec.name}: cols {sc == dc} rows {len(sr)}/{len(dr)}")
print(f"window rehearsal: {green}/{len(window)} green, {red} red")
