"""Validate the min_by exact_dedup rewrite: oracle parity for both
consumer specs at sf0.001 and sf0.01."""
import datetime, math, os, sys
sys.path.insert(0, "/root/repo")
import duckdb
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import registry
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import FIXTURE_TABLES
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark

def _norm(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return str(int(v))
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15: return str(int(r))
        return f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date): return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal): return _norm(float(v))
    return str(v)

def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(_norm(r[i]) for i in order) for r in rows)

spark = get_spark(app_name="check_exact_dedup", master="local[32]", shuffle_partitions=32)
SPECS = ["dedup_exact_by_text", "pipeline_curate_corpus"]
for sfd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sfd, t)}.parquet'")
    for name in SPECS:
        spec = registry.QUERY_SPECS[name]
        sdf = spec.run_spark(spark, sfd)
        sc, sr = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(spec.oracle_text())
        dc, dr = _normalize([d[0] for d in res.description], res.fetchall())
        ok = sc == dc and sr == dr
        print(f"{sfd.split('/')[-1]} {name}: {'GREEN' if ok else 'RED'} ({len(sr)}/{len(dr)} rows)")
    con.close()
